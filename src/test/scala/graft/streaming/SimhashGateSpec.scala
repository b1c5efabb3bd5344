package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming simhash ingestion gate ([[SimhashGate]]): cross-batch
  * near-dup rejection against the accumulated block store, in-batch
  * keep-first collapse, signatureless-doc survival, replay idempotence,
  * and the live foreachBatch wiring. */
class SimhashGateSpec extends SparkSpec {
  import spark.implicits._

  private val page = "the quick brown fox jumps over the lazy dog near " +
    "the river bank while herons watch from the shallows at dusk"
  private val fresh = "volcanic soil produces exceptionally robust " +
    "coffee beans across the equatorial highlands of three continents"
  private val fresh2 = "container orchestration reconciles declared " +
    "state against observed state through level triggered control loops"

  private def acceptedIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet

  test("cross-batch rejection: an exact copy of stored content is dropped; batch N+1 sees batch N's acceptances") {
    val idx = graft.Staging.dirFor("shgate-idx")
    val acc = graft.Staging.dirFor("shgate-acc")
    val b0 = Seq((1L, page)).toDF("doc_id", "text")
    assert(SimhashGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text") == 1L)
    // epoch 1: a copy of epoch 0's page (rejected) + fresh material
    val b1 = Seq((10L, page), (11L, fresh)).toDF("doc_id", "text")
    assert(SimhashGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text") == 1L)
    assert(acceptedIds(s"$acc/batch=1") == Set(11L))
    // epoch 2: a copy of epoch 1's ACCEPTANCE is rejected too
    val b2 = Seq((20L, fresh)).toDF("doc_id", "text")
    assert(SimhashGate.gateBatch(b2, 2L, idx, acc, "doc_id", "text") == 0L)
  }

  test("in-batch collapse: two copies arriving together keep the smaller id") {
    val idx = graft.Staging.dirFor("shgate-inbatch-idx")
    val acc = graft.Staging.dirFor("shgate-inbatch-acc")
    val b = Seq((5L, page), (3L, page), (8L, fresh)).toDF("doc_id", "text")
    assert(SimhashGate.gateBatch(b, 0L, idx, acc, "doc_id", "text") == 2L)
    assert(acceptedIds(s"$acc/batch=0") == Set(3L, 8L))
  }

  test("a doc with no signature (null text) always survives and never poisons the store") {
    val idx = graft.Staging.dirFor("shgate-null-idx")
    val acc = graft.Staging.dirFor("shgate-null-acc")
    val b0 = Seq((1L, Option(page)), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(SimhashGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text") == 2L)
    assert(acceptedIds(s"$acc/batch=0") == Set(1L, 2L))
    // the signatureless doc wrote no block rows — a later null doc is
    // also new material, not a "duplicate of doc 2"
    val b1 = Seq((3L, Option.empty[String])).toDF("doc_id", "text")
    assert(SimhashGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text") == 1L)
  }

  test("replay idempotence: re-delivering a committed epoch reproduces it instead of self-rejecting") {
    val idx = graft.Staging.dirFor("shgate-replay-idx")
    val acc = graft.Staging.dirFor("shgate-replay-acc")
    val b0 = Seq((1L, page)).toDF("doc_id", "text")
    val b1 = Seq((10L, fresh), (11L, fresh2)).toDF("doc_id", "text")
    assert(SimhashGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text") == 1L)
    assert(SimhashGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text") == 2L)
    // the retry: same epoch id, same rows — must NOT probe its own
    // committed block rows (distance 0 to itself) and reject everything
    assert(SimhashGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text") == 2L)
    assert(acceptedIds(s"$acc/batch=1") == Set(10L, 11L))
    // and the store still holds exactly one copy of the epoch's rows
    val storeIds = spark.read.parquet(idx).filter($"batch" === 1)
      .filter($"b" === 0).select("id").as[Long].collect().toSeq
    assert(storeIds.sorted == Seq(10L, 11L))
  }

  test("live foreachBatch: the gate runs end-to-end on a real stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val idx = graft.Staging.dirFor("shgate-e2e-idx")
    val acc = graft.Staging.dirFor("shgate-e2e-acc")
    val ckpt = graft.Staging.dirFor("shgate-e2e-ckpt")
    val q = SimhashGate.start(mem.toDF().toDF("doc_id", "text"), idx, acc, ckpt)
    try {
      mem.addData((1L, page))
      q.processAllAvailable()
      mem.addData((2L, page), (3L, fresh))
      q.processAllAvailable()
    } finally q.stop()
    assert(acceptedIds(acc) == Set(1L, 3L),
      "the second epoch's copy must be gated out on the live path")
  }
}
