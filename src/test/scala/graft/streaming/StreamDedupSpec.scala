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

  /** Replay/TTL script shared by both implementations: the same batches
    * in the same order, returning every emitted (k, v). Batch 3's "z"
    * event advances the watermark past "a"'s TTL horizon (expiring its
    * state); batch 4 re-sends "a", which must pass again.
    */
  private def runScript(
      dedup: org.apache.spark.sql.Dataset[(String, Int, Timestamp)] =>
        org.apache.spark.sql.Dataset[(String, Int, Timestamp)],
      sinkName: String): Set[(String, Int)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Int, Timestamp)]
    val q = dedup(mem.toDS().toDF("k", "v", "ts").as[(String, Int, Timestamp)])
      .toDF("k", "v", "ts").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName(sinkName).start()
    try {
      mem.addData(("a", 1, ts(0)), ("a", 2, ts(1)), ("b", 1, ts(0)))
      q.processAllAvailable()
      mem.addData(("a", 3, ts(2)), ("c", 1, ts(3))) // replay inside TTL → suppressed
      q.processAllAvailable()
      // Advance the watermark past every live key's TTL horizon (wm
      // becomes ts(29) AFTER this batch)...
      mem.addData(("z", 1, ts(30)))
      q.processAllAvailable()
      // ...and run one more batch with no data for those keys: expiry is
      // only processed for keys WITHOUT new data in the batch (both
      // APIs), so this is where "a"/"b"/"c" state is dropped.
      mem.addData(("z2", 1, ts(32)))
      q.processAllAvailable()
      mem.addData(("a", 9, ts(40)), ("c", 7, ts(40))) // past TTL → pass again
      q.processAllAvailable()
      spark.table(sinkName).collect().map(r => (r.getString(0), r.getInt(1))).toSet
    } finally q.stop()
  }

  private val ttl10Min = 600_000L

  test("flatMapGroupsWithState and transformWithState agree on the replay/TTL script") {
    val expected = Set(("a", 1), ("b", 1), ("c", 1), ("z", 1), ("z2", 1), ("a", 9), ("c", 7))
    val v1 = runScript(ds => StreamDedup.dedupByKey[(String, Int, Timestamp)](
      ds, _._1, _._3.getTime, "ts", "1 minute", ttl10Min), "dedup_v1_script")
    assert(v1 == expected, s"fMGWS emitted: $v1")

    // transformWithState requires the RocksDB state store provider; scope
    // the session conf to this query and restore the default after.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val v2 = runScript(ds => StreamDedup.dedupByKeyTws[(String, Int, Timestamp)](
        ds, _._1, _._3.getTime, "ts", "1 minute", ttl10Min), "dedup_v2_script")
      assert(v2 == expected, s"transformWithState emitted: $v2")
      assert(v1 == v2)
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState batch input is rejected") {
    val batch = Seq(("a", 1, ts(0))).toDF("k", "v", "ts").as[(String, Int, Timestamp)]
    val e = intercept[IllegalArgumentException] {
      StreamDedup.dedupByKeyTws[(String, Int, Timestamp)](
        batch, _._1, _._3.getTime, "ts", "1 minute", 1000L)
    }
    assert(e.getMessage.contains("streaming"))
  }
}
