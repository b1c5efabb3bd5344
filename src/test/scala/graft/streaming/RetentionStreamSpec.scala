package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming retention ([[RetentionStream]]): batch ≡ stream on
  * in-order arrival (round-10 directive #8), single-emission per
  * (user, offset) across micro-batches, and the documented horizon /
  * out-of-order bounds. */
class RetentionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val week = 604800L * 1000
  private def ts(w: Int, hourInWeek: Int = 0): Timestamp =
    new Timestamp(w.toLong * week + hourInWeek * 3600_000L)

  /** The batch formulation (the q_retention shape) over the same rows. */
  private def batchRetention(rows: Seq[(Long, Timestamp)]) = {
    val ev = rows.toDF("user_id", "ts")
      .select($"user_id",
        (floor(col("ts").cast("long") / 604800L)).cast("long").as("w"))
    val cohort = ev.groupBy($"user_id").agg(min($"w").as("cohort_week"))
    ev.join(cohort, Seq("user_id"))
      .groupBy($"cohort_week", ($"w" - $"cohort_week").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("batch and stream agree on in-order arrival") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // three users, two cohorts, revisits incl. same-week duplicates
    val data = Seq(
      (1L, ts(100)), (1L, ts(100, 5)), (1L, ts(101)), (1L, ts(103)),
      (2L, ts(100, 2)), (2L, ts(102)),
      (3L, ts(101)), (3L, ts(101, 9)), (3L, ts(104)))
    val mem = MemoryStream[(Long, Timestamp)]
    val inc = RetentionStream.increments(
      mem.toDF().toDF("user_id", "ts"), delay = "1 hour")
    val q = inc.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ret_inc").start()
    try {
      // in-order: feed in ascending event time, split across batches
      val sorted = data.sortBy(_._2.getTime)
      sorted.grouped(3).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = RetentionStream.rollup(spark.table("ret_inc"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batchRetention(data),
        s"stream $streamed vs batch ${batchRetention(data)}")
    } finally q.stop()
  }

  test("each (user, offset) emits exactly once across replayed weeks") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val inc = RetentionStream.increments(
      mem.toDF().toDF("user_id", "ts"), delay = "1 hour")
    val q = inc.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ret_once").start()
    try {
      mem.addData((7L, ts(10))); q.processAllAvailable()
      mem.addData((7L, ts(10, 1)), (7L, ts(11))); q.processAllAvailable()
      mem.addData((7L, ts(11, 3)), (7L, ts(10, 8))); q.processAllAvailable()
      val hits = spark.table("ret_once")
        .select($"cohort_week", $"week_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(hits.length == 2, s"one hit per distinct offset: ${hits.toSeq}")
      assert(hits.toSet == Set((10L, 0L), (10L, 1L)))
    } finally q.stop()
  }

  test("horizon drops far offsets; pre-cohort stragglers clamp to offset 0") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val inc = RetentionStream.increments(
      mem.toDF().toDF("user_id", "ts"), delay = "1000 weeks")
    val q = inc.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ret_edge").start()
    try {
      mem.addData((9L, ts(500))); q.processAllAvailable()
      // 70 weeks past cohort: beyond HorizonWeeks=64 → dropped
      mem.addData((9L, ts(570))); q.processAllAvailable()
      // 2 weeks BEFORE the pinned cohort: clamps into offset 0 (already
      // emitted) → suppressed
      mem.addData((9L, ts(498))); q.processAllAvailable()
      val hits = spark.table("ret_edge")
        .select($"cohort_week", $"week_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(hits.toSeq == Seq((500L, 0L)), s"got ${hits.toSeq}")
    } finally q.stop()
  }
}
