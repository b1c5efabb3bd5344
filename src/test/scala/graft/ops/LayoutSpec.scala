package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private def events = Tables.events(spark, sf001)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  test("clustered layout: row-group user_id spans collapse vs the arrival-order write") {
    val clustered = graft.Staging.dirFor("layout-spec-clustered")
    val raw = graft.Staging.dirFor("layout-spec-raw")
    Layout.writeClustered(events, clustered, Seq("user_id"), numFiles = 8)
    events.repartition(8).write.mode("overwrite").parquet(raw)

    def totalSpan(dir: String): Long =
      Layout.rowGroupRanges(spark, dir, "user_id")
        .map { case (lo, hi) => hi - lo + 1 }.sum
    val clusteredSpan = totalSpan(clustered)
    val rawSpan = totalSpan(raw)
    // arrival-order row groups each cover ~the whole user range; range-
    // partitioned+sorted ones cover disjoint slices summing to ~one range
    assert(clusteredSpan * 4 <= rawSpan,
      s"clustering must collapse row-group spans: clustered=$clusteredSpan raw=$rawSpan")

    // ranges are (near-)disjoint: sorted by min, each next min must not
    // fall strictly inside the previous range
    val ranges = Layout.rowGroupRanges(spark, clustered, "user_id").sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(lo2 >= hi1 - 1,
        s"range-partitioned files must cover (near-)disjoint slices: $ranges")
      case _ =>
    }
  }

  test("layout is result-invariant: clustered read ≡ raw under a range filter") {
    val out = graft.Staging.dirFor("layout-spec-rt")
    Layout.writeClustered(events, out, Seq("user_id"), numFiles = 8)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("user_id").between(3, 7))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(spark.read.parquet(out)) == agg(events))
  }

  test("the range predicate reaches the clustered scan as a pushed filter") {
    val out = graft.Staging.dirFor("layout-spec-push")
    Layout.writeClustered(events, out, Seq("user_id"), numFiles = 8)
    val plan = spark.read.parquet(out)
      .filter(col("user_id").between(10, 19))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(user_id,10"),
      s"row-group skipping requires the filter at the parquet reader:\n$plan")
  }
}
