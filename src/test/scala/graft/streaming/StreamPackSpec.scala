package graft.streaming

import graft.SparkSpec
import graft.ops.Sampling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import StreamPack.{PackDoc, PackedDoc}

class StreamPackSpec extends SparkSpec {
  import spark.implicits._

  test("streaming pack ≡ batch packShards when documents arrive in id order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[PackDoc]
    val q = StreamPack.packByGroup(mem.toDS(), budgetTokens = 100L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pack_out").start()
    val docs = Seq(
      PackDoc(1L, "a", 60L), PackDoc(2L, "a", 60L), PackDoc(3L, "a", 30L),
      PackDoc(4L, "a", 80L), PackDoc(1L, "b", 250L), PackDoc(2L, "b", 10L))
    try {
      // split mid-source across micro-batches: the counter must carry
      mem.addData(docs.take(3): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("pack_out").as[PackedDoc].collect()
        .map(p => (p.group, p.doc_id, p.shard)).toSet

      val batch = Sampling.packShards(
          docs.toDF("doc_id", "group", "n_tokens"),
          "doc_id", "group", "n_tokens", 100L)
        .select("group", "doc_id", "shard")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"in-order streaming pack must equal the batch manifest:\n$streamed\nvs\n$batch")
      // and the known values, so both twins can't be wrong together
      assert(batch == Set(
        ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 1L),
        ("b", 1L, 0L), ("b", 2L, 2L)))
    } finally q.stop()
  }

  test("state carries across an idle group: later batches continue the counter") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[PackDoc]
    val q = StreamPack.packByGroup(mem.toDS(), budgetTokens = 50L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pack_idle_out").start()
    try {
      mem.addData(PackDoc(1L, "x", 40L))
      q.processAllAvailable()
      mem.addData(PackDoc(9L, "y", 10L)) // x idle this batch
      q.processAllAvailable()
      mem.addData(PackDoc(2L, "x", 40L)) // prior 40 → shard 0 still
      q.processAllAvailable()
      mem.addData(PackDoc(3L, "x", 5L))  // prior 80 → shard 1
      q.processAllAvailable()
      val shards = spark.table("pack_idle_out").as[PackedDoc].collect()
        .filter(_.group == "x").map(p => p.doc_id -> p.shard).toMap
      assert(shards == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    } finally q.stop()
  }

  test("batch input is rejected") {
    val e = intercept[IllegalArgumentException] {
      StreamPack.packByGroup(
        Seq(PackDoc(1L, "a", 1L)).toDS(), 10L)
    }
    assert(e.getMessage.contains("streaming"))
  }
}
