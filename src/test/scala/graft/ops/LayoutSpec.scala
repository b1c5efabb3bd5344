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

  test("z-order: BOTH dimensions' row-group spans collapse; single-column clustering collapses only its own") {
    // sf0.01: enough distinct user_ids (150) that the interleave has
    // bits to work with — sf0.001's 15 users make the dimension too
    // coarse to measure collapse robustly.
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val raw = graft.Staging.dirFor("layout-z-raw")
    val zed = graft.Staging.dirFor("layout-z-z")
    val single = graft.Staging.dirFor("layout-z-single")
    ev.repartition(8).write.mode("overwrite").parquet(raw)
    Layout.writeZOrdered(ev, zed, Seq("user_id", "ts"), numFiles = 8)
    Layout.writeClustered(ev, single, Seq("user_id"), numFiles = 8)
    def spans(dir: String, c: String): Long =
      Layout.rowGroupRanges(spark, dir, c).map { case (lo, hi) => hi - lo + 1 }.sum
    // measured sf0.01: user_id 1200 → 711 (1.7×), ts 2.07e16 → 7.0e15
    // (3.0×) — the ~numFiles^(1/2) per-dimension split, modulo range-
    // partition boundaries not landing exactly on bit boundaries
    assert(spans(zed, "user_id") * 14 <= spans(raw, "user_id") * 10,
      s"z-order must collapse user_id spans ≥1.4×: z=${spans(zed, "user_id")} raw=${spans(raw, "user_id")}")
    assert(spans(zed, "ts") * 2 <= spans(raw, "ts"),
      s"z-order must collapse ts spans ≥2×: z=${spans(zed, "ts")} raw=${spans(raw, "ts")}")
    // the control: clustering by user_id alone leaves ts spans at
    // ~full range — the gap z-ordering exists to close
    assert(spans(single, "ts") * 10 >= spans(raw, "ts") * 8,
      s"single-column clustering must NOT collapse ts: single=${spans(single, "ts")} raw=${spans(raw, "ts")}")
  }

  test("z-order is result-invariant: z-clustered read ≡ raw under two-dimensional filters") {
    val out = graft.Staging.dirFor("layout-z-rt")
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    Layout.writeZOrdered(ev, out, Seq("user_id", "ts"), numFiles = 8)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("user_id").between(3, 7) &&
          Tables.tsSeconds(col("ts")) >= 1704672000L)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(spark.read.parquet(out)) == agg(ev))
  }

  test("bucketed join: both sides bucketed on the key → zero shuffle exchanges; raw scans shuffle both") {
    val ord = Tables.orders(spark, sf001).select("o_orderkey", "o_orderpriority")
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_extendedprice")
    Layout.writeBucketed(ord, "graft_spec_bucket_orders",
      graft.Staging.dirFor("bucket-spec-orders"), Seq("o_orderkey"), 8)
    Layout.writeBucketed(li, "graft_spec_bucket_lineitem",
      graft.Staging.dirFor("bucket-spec-lineitem"), Seq("l_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the large-large plan: broadcast would mask the shuffle
      // this layout exists to eliminate
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def joined(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
      val bucketed = joined(spark.table("graft_spec_bucket_orders"),
        spark.table("graft_spec_bucket_lineitem"))
      val raw = joined(ord, li)
      val bPlan = bucketed.queryExecution.executedPlan.toString
      // the join itself must be exchange-free; the final single-key
      // aggregation may still exchange, so assert on the join inputs:
      // no shuffle anywhere upstream of the SortMergeJoin
      val joinSection = bPlan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), s"expected SMJ:\n$bPlan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$bPlan")
      val rPlan = raw.queryExecution.executedPlan.toString
      assert(rPlan.contains("Exchange"),
        s"control: the raw-scan join should shuffle:\n$rPlan")
      // layout must never change results
      val b = bucketed.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val r = raw.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(b == r)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
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
