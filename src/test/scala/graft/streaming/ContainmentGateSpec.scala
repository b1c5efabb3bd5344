package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming containment gate ([[ContainmentGate]]): arriving quotes of
  * stored content are rejected, arrivals that CONTAIN stored content
  * pass (new material), in-batch quotes collapse, replays are
  * idempotent, and the live foreachBatch wiring works end-to-end. */
class ContainmentGateSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    "intro paragraph about animals follows here " +
    "the quick brown fox jumps over the lazy dog tonight " +
    "and then a long discussion of canine behavior patterns " +
    "closes this article about domesticated animal instincts"
  private val quote = "the quick brown fox jumps over the lazy dog tonight"
  private val unrelated =
    "volcanic soil produces exceptionally robust coffee beans " +
    "across the equatorial highlands of three continents"

  private def accepted(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet

  test("cross-batch: a quote of stored content is rejected; containing-new-material passes") {
    val idx = graft.Staging.dirFor("cgate-idx")
    val acc = graft.Staging.dirFor("cgate-acc")
    val b0 = Seq((1L, page), (2L, unrelated)).toDF("doc_id", "text")
    assert(ContainmentGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text") == 2L)
    // epoch 1: the quote (contained in stored page → reject), a fresh
    // doc, and a SUPERSET of stored content (contains doc 2 → new
    // material, passes — the asymmetric direction)
    val b1 = Seq(
      (10L, quote),
      (11L, "medieval manuscripts reveal trade routes across the steppe"),
      (12L, unrelated + " a new closing analysis of soil chemistry " +
        "extends this reporting with fresh field measurements today"))
      .toDF("doc_id", "text")
    val n1 = ContainmentGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text")
    assert(n1 == 2L, s"quote rejected, fresh + superset accepted: $n1")
    assert(accepted(s"$acc/batch=1") == Set(11L, 12L))
    // batch N+1 probes batch N's acceptances: a quote of doc 12's NEW
    // tail is now rejected too
    val b2 = Seq((20L, "a new closing analysis of soil chemistry " +
      "extends this reporting with fresh field measurements today"))
      .toDF("doc_id", "text")
    assert(ContainmentGate.gateBatch(b2, 2L, idx, acc, "doc_id", "text") == 0L)
  }

  test("in-batch collapse: a quote and its page arriving together keep only the page") {
    val idx = graft.Staging.dirFor("cgate-inbatch-idx")
    val acc = graft.Staging.dirFor("cgate-inbatch-acc")
    val b = Seq((5L, quote), (6L, page)).toDF("doc_id", "text")
    assert(ContainmentGate.gateBatch(b, 0L, idx, acc, "doc_id", "text") == 1L)
    assert(accepted(s"$acc/batch=0") == Set(6L))
  }

  test("replay idempotence: re-gating a committed epoch does not self-reject") {
    val idx = graft.Staging.dirFor("cgate-replay-idx")
    val acc = graft.Staging.dirFor("cgate-replay-acc")
    val b0 = Seq((1L, page)).toDF("doc_id", "text")
    ContainmentGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text")
    val b1 = Seq((7L, unrelated)).toDF("doc_id", "text")
    val n1 = ContainmentGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text")
    val first = accepted(s"$acc/batch=1")
    val n2 = ContainmentGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text")
    assert(n1 == n2 && n1 == 1L,
      "replay must not self-reject against its own stored shingles")
    assert(accepted(s"$acc/batch=1") == first)
  }

  test("end-to-end stream: foreachBatch wiring gates a live feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = graft.Staging.dirFor("cgate-e2e-idx")
    val acc = graft.Staging.dirFor("cgate-e2e-acc")
    val ckpt = graft.Staging.dirFor("cgate-e2e-ckpt")
    val q = ContainmentGate.start(mem.toDF().toDF("doc_id", "text"),
      idx, acc, ckpt)
    try {
      mem.addData((1L, page))
      q.processAllAvailable()
      mem.addData((2L, quote), (3L, unrelated))
      q.processAllAvailable()
    } finally q.stop()
    assert(accepted(acc) == Set(1L, 3L),
      "the stored page survives, the later quote is gated out, fresh content passes")
  }
}
