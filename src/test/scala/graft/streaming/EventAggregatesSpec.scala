package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class EventAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L * 24 + min * 60_000L)

  test("streaming tumbling window with watermark emits finalized windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = EventAggregates.hourlyByType(
      mem.toDF().toDF("ts", "event_type", "value"), watermarkDelay = "10 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("hourly_out").start()
    try {
      mem.addData((ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(10), "view", 5.0))
      q.processAllAvailable()
      // advance event time past window end + watermark → hour 0 finalizes
      mem.addData((ts(75), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts(200), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select($"event_type", $"n", $"sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("click", 2L, 3.0)), s"hour-0 click window finalized: $rows")
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming session window groups by gap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val agg = EventAggregates.sessionsByUser(
      mem.toDF().toDF("ts", "user_id", "value"), gap = "5 minutes",
      watermarkDelay = "1 minute")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_out").start()
    try {
      // user 1: two events 2 min apart (one session), then 30 min gap
      mem.addData((ts(0), 1L, 1.0), (ts(2), 1L, 1.0), (ts(32), 1L, 1.0))
      q.processAllAvailable()
      mem.addData((ts(120), 1L, 0.0)) // advance watermark, close sessions
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .select($"user_id", $"n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.contains((1L, 2L)), s"first session has 2 events: ${rows.mkString(",")}")
      assert(rows.contains((1L, 1L)), "second session has 1 event")
    } finally q.stop()
  }

  test("batch and streaming share the same plan shape (batch run)") {
    val batch = Seq((ts(5), "click", 1.0), (ts(65), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val out = EventAggregates.hourlyByType(batch).collect()
    assert(out.length == 2)
  }

  test("stream-stream join pairs events within the time bound only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val errors = MemoryStream[(Timestamp, Long, Long)]
    val joined = EventAggregates.followedBy(
      purchases.toDF().toDF("ts", "user_id", "event_id"),
      errors.toDF().toDF("ts", "user_id", "event_id"),
      within = "10 minutes", watermarkDelay = "5 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_out").start()
    try {
      purchases.addData((ts(0), 1L, 100L), (ts(0), 2L, 101L))
      errors.addData(
        (ts(5), 1L, 200L),   // inside the 10-min bound → pair
        (ts(20), 1L, 201L),  // outside the bound → no pair
        (ts(3), 3L, 202L))   // different user → no pair
      q.processAllAvailable()
      // advance both watermarks so state can expire and results flush
      purchases.addData((ts(120), 9L, 999L))
      errors.addData((ts(120), 9L, 998L))
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
        .select($"user_id", $"first_event_id", $"then_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((1L, 100L, 200L)), s"in-bound pair found: $rows")
      assert(!rows.exists(_._3 == 201L), "out-of-bound error not paired")
      assert(!rows.exists(_._1 == 3L), "cross-user events not paired")
    } finally q.stop()
  }

  test("followedBy works identically on batch frames") {
    val first = Seq((ts(0), 1L, 100L)).toDF("ts", "user_id", "event_id")
    val then_ = Seq((ts(5), 1L, 200L), (ts(20), 1L, 201L))
      .toDF("ts", "user_id", "event_id")
    val out = EventAggregates.followedBy(first, then_, within = "10 minutes")
      .select($"first_event_id", $"then_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((100L, 200L)))
  }
}
