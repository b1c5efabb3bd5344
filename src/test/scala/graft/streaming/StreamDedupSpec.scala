package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(86_400_000L + min * 60_000L)

  test("stateful dedup: first occurrence passes, replays suppressed across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Int, Timestamp)]
    val deduped = StreamDedup.dedupByKey[(String, Int, Timestamp)](
      mem.toDS().toDF("k", "v", "ts").as[(String, Int, Timestamp)],
      key = _._1, eventTimeMs = _._3.getTime, eventTimeCol = "ts",
      delay = "1 minute", ttlMs = 3_600_000L)
    val q = deduped.toDF("k", "v", "ts").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("dedup_out").start()
    try {
      mem.addData(("a", 1, ts(0)), ("a", 2, ts(1)), ("b", 1, ts(0)))
      q.processAllAvailable()
      mem.addData(("a", 3, ts(2)), ("c", 1, ts(3)))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(rows == Set(("a", 1), ("b", 1), ("c", 1)),
        s"one event per key, first wins: $rows")
    } finally q.stop()
  }

  test("batch input is rejected (watermark-less state cannot expire)") {
    val batch = Seq(("a", 1, ts(0))).toDF("k", "v", "ts").as[(String, Int, Timestamp)]
    val e = intercept[IllegalArgumentException] {
      StreamDedup.dedupByKey[(String, Int, Timestamp)](
        batch, _._1, _._3.getTime, "ts", "1 minute", 1000L)
    }
    assert(e.getMessage.contains("streaming"))
  }
}
