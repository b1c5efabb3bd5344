package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming funnel ([[FunnelStream]]): batch ≡ stream on in-order
  * arrival against the q_funnel formulation, one conversion per user,
  * window bound respected. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** The batch q_funnel shape over the same rows. */
  private def batchFunnel(rows: Seq[(Long, String, Timestamp)]) = {
    val ev = rows.toDF("user_id", "event_type", "ts")
      .select($"user_id", $"event_type", $"ts".cast("long").as("t_sec"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id").agg(min($"t_sec").as("t_click"))
    ev.filter($"event_type" === "purchase")
      .join(clicks, Seq("user_id"))
      .filter($"t_sec" > $"t_click" && $"t_sec" <= $"t_click" + 86400)
      .groupBy($"user_id", $"t_click")
      .agg(min($"t_sec").as("t_purchase"))
      .withColumn("secs_to_convert", $"t_purchase" - $"t_click")
      .select($"user_id", $"t_click", $"t_purchase", $"secs_to_convert")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("batch and stream agree on in-order arrival") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400L
    val data = Seq(
      // user 1: click, purchase inside the day (+ a later second purchase)
      (1L, "click", ts(1000)), (1L, "purchase", ts(5000)), (1L, "purchase", ts(9000)),
      // user 2: purchase BEFORE any click (no conversion), then click, no purchase
      (2L, "purchase", ts(500)), (2L, "click", ts(2000)),
      // user 3: click, purchase outside the 24h window
      (3L, "click", ts(100)), (3L, "purchase", ts(100 + day + 1)),
      // user 4: two clicks, purchase within window of the FIRST
      (4L, "click", ts(3000)), (4L, "click", ts(4000)), (4L, "purchase", ts(7000)),
      // user 5: other event types only
      (5L, "view", ts(1234)))
    val mem = MemoryStream[(Long, String, Timestamp)]
    val conv = FunnelStream.conversions(
      mem.toDF().toDF("user_id", "event_type", "ts"))
    val q = conv.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_conv").start()
    try {
      data.sortBy(_._3.getTime).grouped(4).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("funnel_conv")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batchFunnel(data),
        s"stream $streamed vs batch ${batchFunnel(data)}")
      assert(streamed.map(_._1) == Set(1L, 4L))
    } finally q.stop()
  }

  test("k-step: batch Funnel.firstCompletion ≡ stream on the 3-step chain") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400L
    val data = Seq(
      // user 1: clean view → click → purchase
      (1L, "view", ts(100)), (1L, "click", ts(200)), (1L, "purchase", ts(300)),
      // user 2: click before the first view must NOT count as step 2
      (2L, "click", ts(50)), (2L, "view", ts(100)), (2L, "click", ts(150)),
      (2L, "purchase", ts(160)),
      // user 3: completes steps 1-2, purchase outside click's window
      (3L, "view", ts(10)), (3L, "click", ts(20)), (3L, "purchase", ts(20 + day + 1)),
      // user 4: second view is irrelevant once the chain advanced
      (4L, "view", ts(1000)), (4L, "view", ts(2000)), (4L, "click", ts(3000)),
      (4L, "purchase", ts(4000)),
      // user 5: purchase at the SAME second as click — strict > rejects it
      (5L, "view", ts(500)), (5L, "click", ts(600)), (5L, "purchase", ts(600)),
      // user 6: extra post-completion events never emit a second row
      (6L, "view", ts(1)), (6L, "click", ts(2)), (6L, "purchase", ts(3)),
      (6L, "view", ts(4)), (6L, "click", ts(5)), (6L, "purchase", ts(6)))
    val steps = Seq("view", "click", "purchase")
    val wins = Seq(day, day)
    val batch = graft.operators.Funnel.firstCompletion(
        data.toDF("user_id", "event_type", "ts")
          .select($"user_id", $"event_type", $"ts".cast("long").as("t_sec")),
        steps, wins)
      .as[(Long, Long, Long, Long)].collect().toSet
    val mem = MemoryStream[(Long, String, Timestamp)]
    val comp = FunnelStream.completions(
      mem.toDF().toDF("user_id", "event_type", "ts"), steps, wins)
    val q = comp.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_k3").start()
    try {
      data.sortBy(_._3.getTime).grouped(5).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.table("funnel_k3")
        .select($"user_id", $"ts_steps"(0), $"ts_steps"(1), $"ts_steps"(2))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed.map(_._1) == Set(1L, 2L, 4L, 6L))
    } finally q.stop()
  }

  test("at most one conversion per user, across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val conv = FunnelStream.conversions(
      mem.toDF().toDF("user_id", "event_type", "ts"))
    val q = conv.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_once").start()
    try {
      mem.addData((8L, "click", ts(10))); q.processAllAvailable()
      mem.addData((8L, "purchase", ts(20))); q.processAllAvailable()
      mem.addData((8L, "purchase", ts(30)), (8L, "click", ts(40)))
      q.processAllAvailable()
      val rows = spark.table("funnel_once")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows == Seq((8L, 10L, 20L, 10L)), s"got $rows")
    } finally q.stop()
  }
}
