package graft.streaming

import graft.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Session twin contract: closed streaming sessions equal the batch
  * rollup of the same events — including the exact-gap boundary, where
  * the off-by-one between the batch `≤ gap` rule and `session_window`'s
  * overlap rule is corrected by the g+1 window. */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 60L

  // user a: two sessions split by a 61 s gap, with an exact-60 s step
  // INSIDE the first session (the boundary the g+1 correction pins);
  // user b: one session; sentinel user z closes the watermark.
  private val events: Seq[(String, Long)] = Seq(
    ("a", 1000L), ("a", 1060L), ("a", 1090L), // exact-gap step 1000→1060 stays
    ("a", 1151L), ("a", 1200L),               // 1090→1151 = 61 > gap: new session
    ("b", 500L), ("b", 530L))

  private def snap(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("closed streaming sessions equal the batch rollup, boundary included") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = SessionStream.sessions(
      mem.toDF().toDF("user", "t_sec")
        .withColumn("ts", col("t_sec").cast("timestamp")),
      "user", "ts", gapSeconds = Gap, watermarkDelay = "0 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_stream").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far past every session end
      mem.addData(("z", 100000L))
      q.processAllAvailable()
      mem.addData(("z", 200000L))
      q.processAllAvailable()

      val streamed = snap(spark.table("sess_stream")
        .filter(col("user") =!= "z")
        .select("user", "session_start", "session_end", "duration_sec", "n_events")
        .collect().toSeq)
      val batch = snap(Sessionize.sessionStats(
          events.toDF("user", "t_sec"), "user", "t_sec", Gap)
        .select(col("user"), col("session_start"), col("session_end"),
          col("duration_sec"), col("n_events"))
        .collect().toSeq)
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      // and the boundary really is load-bearing: 3 sessions total,
      // the first containing the exact-gap step
      assert(batch.count(_._1 == "a") == 2)
      assert(batch.exists(s => s._1 == "a" && s._2 == 1000L && s._5 == 3L))
    } finally q.stop()
  }

  test("out-of-order arrival within the watermark still matches batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = SessionStream.sessions(
      mem.toDF().toDF("user", "t_sec")
        .withColumn("ts", col("t_sec").cast("timestamp")),
      "user", "ts", gapSeconds = Gap, watermarkDelay = "300 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_stream2").start()
    try {
      // deliver the second session before the straggler that EXTENDS
      // the first — the merged-window state must absorb it
      mem.addData(("a", 1000L), ("a", 1151L))
      q.processAllAvailable()
      mem.addData(("a", 1050L)) // straggler inside watermark, merges 1000's session
      q.processAllAvailable()
      mem.addData(("z", 100000L)); q.processAllAvailable()
      mem.addData(("z", 200000L)); q.processAllAvailable()
      val streamed = snap(spark.table("sess_stream2")
        .filter(col("user") =!= "z")
        .select("user", "session_start", "session_end", "duration_sec", "n_events")
        .collect().toSeq)
      val batch = snap(Sessionize.sessionStats(
          Seq(("a", 1000L), ("a", 1050L), ("a", 1151L)).toDF("user", "t_sec"),
          "user", "t_sec", Gap)
        .select(col("user"), col("session_start"), col("session_end"),
          col("duration_sec"), col("n_events"))
        .collect().toSeq)
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }
}
