package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew remedies must be *semantically invisible*: salted plans produce
  * row-identical results to their naive formulations on a deliberately
  * hot-keyed dataset (one key owning ~90% of rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key "whale" owns 9000 rows; 100 cold keys own 10 each
  private lazy val skewed = {
    val hot = (0 until 9000).map(i => ("whale", i.toLong, (i * 7919) % 10007))
    val cold = for (kId <- 0 until 100; i <- 0 until 10)
      yield (s"k$kId", (100000 + kId * 10 + i).toLong, (kId * 31 + i) % 997)
    (hot ++ cold).toDF("key", "row_id", "value")
  }

  test("saltedJoin equals the naive join on a hot-keyed relation") {
    val dim = (Seq("whale") ++ (0 until 100 by 3).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "attr")
    val naive = skewed.join(dim, Seq("key"))
      .select("key", "row_id", "attr").collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("key"),
        saltBy = col("row_id"), salt = 8)
      .select("key", "row_id", "attr").collect().toSet
    assert(salted == naive)
    assert(salted.size == 9000 + 34 * 10)
  }

  test("saltedJoin spreads a hot key across salt sub-partitions") {
    val salts = skewed.filter($"key" === "whale")
      .select(Skew.saltCol(col("row_id"), 8).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts.size == 8, "hot key's rows must cover every salt bucket")
  }

  test("saltedTopK equals the single-window top-k (total order)") {
    val order = Seq(col("value").desc, col("row_id").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy(order: _*)
    val naive = skewed.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select("key", "row_id", "rank").collect().toSet
    val salted = Skew.saltedTopK(skewed, Seq("key"), order, k = 5,
        saltBy = col("row_id"), salt = 8)
      .select("key", "row_id", "rank").collect().toSet
    assert(salted == naive)
    assert(salted.count(_.getString(0) == "whale") == 5)
  }
}
