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
