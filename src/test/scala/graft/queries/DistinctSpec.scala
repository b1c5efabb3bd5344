package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Approximate distinct aggregation (HLL++): relative error stays within
  * the configured bound vs the exact count — the sketch itself is
  * engine-specific, so this is the correctness check standing in for a
  * SQL oracle (see ExtraQueries.qDistinctAgg). */
class DistinctSpec extends SparkSpec {

  test("approx_count_distinct within rsd bound of exact") {
    val li = Tables.lineitem(spark, sf001)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    val err = math.abs(approx - exact) / exact
    assert(err <= 0.06, s"exact=$exact approx=$approx err=$err (3x rsd bound)")
  }

  test("approx_percentile within rank-error bound of exact; partition-merge invariant") {
    // The 100 TB quantile path (one pass, mergeable sketches — see
    // ExtraQueries.qPercentiles doc). approx_percentile(accuracy a)
    // bounds RANK error by n/a, not value error: convert via the
    // empirical CDF. And the sketch must be MERGEABLE — the same
    // answer (same bound) regardless of how rows were partitioned,
    // which is what makes it distributable at all.
    val ord = Tables.orders(spark, sf001).select(col("o_totalprice"))
    val n = ord.count().toDouble
    val acc = 1000
    def approxP(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(expr(s"approx_percentile(o_totalprice, 0.5, $acc)")).head().getDouble(0)
    val exactP = ord.agg(expr("percentile(o_totalprice, 0.5)")).head().getDouble(0)
    val answers = Seq(ord.coalesce(1), ord.repartition(7)).map { df =>
      val a = approxP(df)
      // rank of the approx answer must be within n/acc of n/2
      val rank = ord.filter(col("o_totalprice") <= a).count().toDouble
      assert(math.abs(rank - n / 2) <= 2 * n / acc + 1,
        s"rank error: exact median $exactP, approx $a, rank $rank of $n")
      a
    }
    // The merge-invariance half of the claim: the 1-partition and
    // 7-partition sketches must agree on the answer itself, not just
    // each sit inside the bound. (At this n and accuracy the summaries
    // never compress, so merge order cannot move the result; a
    // difference here means partition-merge sensitivity crept in.)
    assert(answers.distinct.size == 1,
      s"partition-merge changed the answer: ${answers.mkString(" vs ")} (exact $exactP)")
  }

  test("approx distinct per group tracks exact ordering") {
    val li = Tables.lineitem(spark, sf001)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val e = r.getLong(1).toDouble
      val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.06, s"group ${r.getString(0)}: $e vs $a")
    }
  }
}
