package graft.streaming

import graft.SparkSpec
import graft.ops.Chunking
import org.apache.spark.sql.functions._

/** Streaming paragraph-dedup gate ([[ParagraphGate]]): cross-batch
  * rejection against the accumulated key store, in-batch collapse,
  * replay idempotence, and the live foreachBatch wiring. */
class ParagraphGateSpec extends SparkSpec {
  import spark.implicits._

  // 20-token blocks by construction: every "paragraph" below is exactly
  // one gate window, so block identity is directly controllable
  private def para(tag: String): String =
    (1 to 20).map(i => s"$tag$i").mkString(" ")

  private def accepted(dir: String) =
    spark.read.parquet(dir)
      .select("doc_id", "n_chunks", "n_kept", "kept_text")

  test("cross-batch rejection: a block accepted in epoch 0 is dropped from epoch 1 arrivals") {
    val keys = graft.Staging.dirFor("pgate-keys")
    val acc = graft.Staging.dirFor("pgate-acc")
    val b0 = Seq((1L, para("alpha") + " " + para("beta")))
      .toDF("doc_id", "text")
    val n0 = ParagraphGate.gateBatch(b0, 0L, keys, acc, "doc_id", "text")
    assert(n0 == 2L, "a cold store accepts every first-seen block")
    // epoch 1: one boilerplate copy (alpha), one fresh block, one doc
    // that is ENTIRELY stale and must survive as an empty census row
    val b1 = Seq(
      (10L, para("alpha") + " " + para("gamma")),
      (11L, para("beta"))).toDF("doc_id", "text")
    val n1 = ParagraphGate.gateBatch(b1, 1L, keys, acc, "doc_id", "text")
    assert(n1 == 1L, s"only the fresh block passes: $n1")
    val rows = accepted(s"$acc/batch=1").as[(Long, Long, Long, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (10L, 2L, 1L, para("gamma")),
      (11L, 1L, 0L, "")), rows.mkString(", "))
    // batch N+1 sees batch N's acceptances: gamma re-arrives → dropped
    val b2 = Seq((20L, para("gamma"))).toDF("doc_id", "text")
    assert(ParagraphGate.gateBatch(b2, 2L, keys, acc, "doc_id", "text") == 0L)
  }

  test("in-batch collapse: two copies arriving together pass once, keep-first by (id, idx)") {
    val keys = graft.Staging.dirFor("pgate-inbatch-keys")
    val acc = graft.Staging.dirFor("pgate-inbatch-acc")
    val b = Seq(
      (2L, para("dup")),
      (1L, para("dup") + " " + para("solo"))).toDF("doc_id", "text")
    ParagraphGate.gateBatch(b, 0L, keys, acc, "doc_id", "text")
    val rows = accepted(s"$acc/batch=0").as[(Long, Long, Long, String)]
      .collect().sortBy(_._1)
    // doc 1 has the smaller id → keeps the shared block
    assert(rows.toSeq == Seq(
      (1L, 2L, 2L, para("dup") + " " + para("solo")),
      (2L, 1L, 0L, "")), rows.mkString(", "))
  }

  test("replay idempotence: re-gating a committed epoch rewrites identical outputs (no self-rejection)") {
    val keys = graft.Staging.dirFor("pgate-replay-keys")
    val acc = graft.Staging.dirFor("pgate-replay-acc")
    ParagraphGate.gateBatch(
      Seq((1L, para("base"))).toDF("doc_id", "text"),
      0L, keys, acc, "doc_id", "text")
    val b1 = Seq((5L, para("base") + " " + para("novel")))
      .toDF("doc_id", "text")
    val n1 = ParagraphGate.gateBatch(b1, 1L, keys, acc, "doc_id", "text")
    val first = accepted(s"$acc/batch=1").as[(Long, Long, Long, String)]
      .collect().toSeq
    val k1 = spark.read.parquet(keys).count()
    val n2 = ParagraphGate.gateBatch(b1, 1L, keys, acc, "doc_id", "text")
    val again = accepted(s"$acc/batch=1").as[(Long, Long, Long, String)]
      .collect().toSeq
    assert(n1 == n2 && n1 == 1L, "replay must not self-reject against its own keys")
    assert(first == again)
    assert(spark.read.parquet(keys).count() == k1,
      "replay must replace its key partition, not grow it")
  }

  test("gated epochs compose to the batch operator when each block's first occurrence leads its epoch") {
    // when no key crosses epochs out of id order, gate ∪ epochs ≡ the
    // one-shot batch operator over the union — the twin property on a
    // clean split
    val keys = graft.Staging.dirFor("pgate-twin-keys")
    val acc = graft.Staging.dirFor("pgate-twin-acc")
    val docs = Seq(
      (1L, para("p1") + " " + para("p2")),
      (2L, para("p2") + " " + para("p3")),
      (10L, para("p3") + " " + para("p4")),
      (11L, para("p4") + " " + para("p5"))).toDF("doc_id", "text")
    ParagraphGate.gateBatch(docs.filter($"doc_id" < 10), 0L, keys, acc,
      "doc_id", "text")
    ParagraphGate.gateBatch(docs.filter($"doc_id" >= 10), 1L, keys, acc,
      "doc_id", "text")
    val gated = accepted(acc).as[(Long, Long, Long, String)]
      .collect().toSet
    val batch = Chunking.dedupParagraphs(docs, "doc_id", "text", 20)
      .select(col("id").as("doc_id"), col("n_chunks"), col("n_kept"),
        col("kept_text"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(gated == batch, s"$gated vs $batch")
  }

  test("end-to-end stream: foreachBatch wiring gates a live feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val keys = graft.Staging.dirFor("pgate-e2e-keys")
    val acc = graft.Staging.dirFor("pgate-e2e-acc")
    val ckpt = graft.Staging.dirFor("pgate-e2e-ckpt")
    val q = ParagraphGate.start(mem.toDF().toDF("doc_id", "text"),
      keys, acc, ckpt)
    try {
      mem.addData((1L, para("x1")))
      q.processAllAvailable()
      mem.addData((2L, para("x1") + " " + para("x2")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = accepted(acc).as[(Long, Long, Long, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 1L, 1L, para("x1")),
      (2L, 2L, 1L, para("x2"))), rows.mkString(", "))
  }
}
