package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ops.LanguageModel
import org.apache.spark.sql.functions._

/** Streaming perplexity gate ([[PplGate]]): frozen LM + frozen cuts per
  * epoch, twin equality with the batch bucketing, replay idempotence,
  * and the no-evidence-rejects boundary. */
class PplGateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val gate = PplGate.freeze(
    docs.filter(col("lang") === "en"), docs, "doc_id", "text", bands = 3)

  private def batchHead: Set[Long] = {
    val ppl = LanguageModel.perplexityKnVsSlice(docs, "doc_id", "text",
      col("lang") === "en")
    LanguageModel.perplexityBuckets(ppl, bands = 3)
      .filter(col("band") === 0).select("id").as[Long].collect().toSet
  }

  test("gated epochs union to exactly the batch HEAD tier (twin property)") {
    val dir = graft.Staging.dirFor("ppl-gate")
    val n = (0 until 3).map { e =>
      PplGate.gateBatch(docs.filter(pmod(col("doc_id"), lit(3)) === e),
        e.toLong, dir, "doc_id", "text", gate, maxBand = 0)
    }.sum
    val streamed = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    val batch = batchHead
    assert(streamed == batch, "gate ∪ epochs must equal the batch head tier")
    assert(n.toLong == batch.size)
    // the cut is load-bearing: roughly a third of the corpus
    val total = docs.count()
    assert(batch.size > total / 6 && batch.size < total / 2)
  }

  test("frozen cuts are the batch operator's cuts, verbatim") {
    val ppl = LanguageModel.perplexityKnVsSlice(docs, "doc_id", "text",
      col("lang") === "en")
    assert(gate.cuts == LanguageModel.perplexityCuts(ppl, 3))
    assert(gate.cuts.length == 2 && gate.cuts(0) <= gate.cuts(1))
  }

  test("replay of a committed epoch rewrites the identical partition") {
    val dir = graft.Staging.dirFor("ppl-gate-replay")
    val b0 = docs.filter(col("doc_id") < 100)
    val n1 = PplGate.gateBatch(b0, 0L, dir, "doc_id", "text", gate, 1)
    val first = spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted
    val n2 = PplGate.gateBatch(b0, 0L, dir, "doc_id", "text", gate, 1)
    val again = spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted
    assert(n1 == n2 && first.toSeq == again.toSeq)
  }

  test("a document with no bigrams (< 2 tokens) is rejected, not passed") {
    val dir = graft.Staging.dirFor("ppl-gate-short")
    val b = Seq((1L, "single"), (2L, (1 to 30).map(_ => "the fast table scan")
      .mkString(" "))).toDF("doc_id", "text")
    PplGate.gateBatch(b, 0L, dir, "doc_id", "text", gate, maxBand = 2)
    val kept = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"short doc must not pass unscored, got $kept")
  }

  test("end-to-end stream: foreachBatch wiring gates a live feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dir = graft.Staging.dirFor("ppl-gate-e2e")
    val ckpt = graft.Staging.dirFor("ppl-gate-ckpt")
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().take(60)
    val q = PplGate.start(mem.toDF().toDF("doc_id", "text"), dir, ckpt,
      "doc_id", "text", gate, maxBand = 0)
    try {
      mem.addData(rows.take(30).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.drop(30).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    val ids = rows.map(_._1).toSet
    assert(streamed == batchHead.intersect(ids))
  }
}
