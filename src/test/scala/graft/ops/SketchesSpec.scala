package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portable HLL ([[Sketches]]): accuracy on both correction branches,
  * the split-merge identity that makes the sketch distributable, and
  * partitioning invariance. The cross-engine replay (hash → registers
  * → estimate → branch pick) is the `q_hll_distinct` oracle. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def approxOf(df: DataFrame): Double =
    df.select("approx").as[Double].head()

  test("raw-HLL branch: ~1500 distinct at p=6 (m=64) lands within 3σ") {
    // distinct l_orderkey at sf0.001 ≫ 2.5·64 — the raw branch, with
    // theoretical rse 1.04/√64 = 13%.
    val li = Tables.lineitem(spark, sf001).withColumn("g", lit("all"))
    val exact = li.select("l_orderkey").distinct().count().toDouble
    assert(exact > 2.5 * 64, s"fixture must exercise the raw branch ($exact)")
    val est = approxOf(Sketches.hllDistinct(li, Seq("g"), col("l_orderkey"), "s1", p = 6))
    assert(math.abs(est - exact) / exact < 0.39,
      s"exact=$exact approx=$est (3x the 13% rse)")
  }

  test("linear-counting branch: 200 distinct at p=9 is near-exact") {
    val df = (1 to 1000).map(i => ("all", i % 200)).toDF("g", "v")
    val est = approxOf(Sketches.hllDistinct(df, Seq("g"), col("v"), "s2", p = 9))
    assert(math.abs(est - 200.0) / 200.0 < 0.1,
      s"linear counting at occupancy ~200/512 should be tight, got $est")
  }

  test("split sketches merge to the whole-corpus sketch exactly") {
    val li = Tables.lineitem(spark, sf001).withColumn("g", lit("all"))
    val whole = approxOf(Sketches.hllDistinct(li, Seq("g"), col("l_orderkey"), "s3", p = 9))
    // two disjoint splits sketched INDEPENDENTLY, merged register-wise
    val a = Sketches.hllRegisters(li.filter(col("l_orderkey") % 2 === 0),
      Seq("g"), col("l_orderkey"), "s3", p = 9)
    val b = Sketches.hllRegisters(li.filter(col("l_orderkey") % 2 =!= 0),
      Seq("g"), col("l_orderkey"), "s3", p = 9)
    val merged = approxOf(Sketches.hllEstimate(a.union(b), Seq("g"), p = 9))
    assert(merged == whole,
      s"register max-merge must equal the single-pass sketch: $merged vs $whole")
    // and merging a sketch with itself changes nothing (idempotent max)
    val doubled = approxOf(Sketches.hllEstimate(a.union(b).union(a), Seq("g"), p = 9))
    assert(doubled == whole, "duplicate registers must not move the estimate")
  }

  test("estimate is partitioning-invariant") {
    val li = Tables.lineitem(spark, sf001).withColumn("g", lit("all"))
    val one = approxOf(Sketches.hllDistinct(li.coalesce(1), Seq("g"),
      col("l_orderkey"), "s4", p = 9))
    val many = approxOf(Sketches.hllDistinct(li.repartition(7), Seq("g"),
      col("l_orderkey"), "s4", p = 9))
    assert(one == many, s"max-based sketch cannot depend on arrival order: $one vs $many")
  }

  test("plan: two aggregation exchanges total — registers then group rollup") {
    val li = Tables.lineitem(spark, sf001).withColumn("g", col("l_returnflag"))
    val q = Sketches.hllDistinct(li, Seq("g"), col("l_orderkey"), "s5", p = 9)
    q.collect()
    // Count executed shuffle stages (the AQE plan STRING prints the
    // initial plan's exchanges a second time — ShuffleQueryStage rows
    // exist only in the final plan).
    val p = q.queryExecution.executedPlan.toString
    assert(p.split("ShuffleQueryStage").length - 1 == 2,
      s"register agg + group rollup; the estimate's merge re-agg must reuse the\n" +
        s"(group, j) partitioning, not add a third shuffle:\n$p")
  }
}
