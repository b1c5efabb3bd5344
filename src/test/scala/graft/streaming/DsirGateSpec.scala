package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ops.Dsir
import org.apache.spark.sql.functions._

/** Streaming DSIR gate ([[DsirGate]]): frozen-model scoring per epoch,
  * twin equality with the batch operator, replay idempotence, and the
  * no-evidence-rejects boundary. */
class DsirGateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val frozen = Dsir.freeze(
    Dsir.train(docs, "doc_id", "text", col("lang") === "en", buckets = 512))

  test("gated epochs union to exactly the batch selection (twin property)") {
    val dir = graft.Staging.dirFor("dsir-gate")
    val tau = 0.0
    // split the corpus into 3 epochs by id residue and gate each
    val n = (0 until 3).map { e =>
      DsirGate.gateBatch(docs.filter(pmod(col("doc_id"), lit(3)) === e),
        e.toLong, dir, "doc_id", "text", frozen, tau)
    }.sum
    val streamed = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    val batch = Dsir.logWeights(docs, "doc_id", "text", frozen.thaw(spark))
      .filter(col("logw") >= tau).select("id").as[Long].collect().toSet
    assert(streamed == batch, "gate ∪ epochs must equal the batch cut")
    assert(n.toLong == batch.size)
    assert(batch.nonEmpty && batch.size < docs.count(),
      "threshold should be load-bearing on the fixture corpus")
  }

  test("replay of a committed epoch rewrites the identical partition") {
    val dir = graft.Staging.dirFor("dsir-gate-replay")
    val b0 = docs.filter(col("doc_id") < 100)
    val n1 = DsirGate.gateBatch(b0, 0L, dir, "doc_id", "text", frozen, 0.0)
    val first = spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted
    val n2 = DsirGate.gateBatch(b0, 0L, dir, "doc_id", "text", frozen, 0.0)
    val again = spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted
    assert(n1 == n2 && first.toSeq == again.toSeq)
  }

  test("a document with no features (< 2 tokens) is rejected, not passed") {
    val dir = graft.Staging.dirFor("dsir-gate-short")
    val b = Seq((1L, "single"), (2L, (1 to 30).map(_ => "the fast table scan")
      .mkString(" "))).toDF("doc_id", "text")
    DsirGate.gateBatch(b, 0L, dir, "doc_id", "text", frozen, -1e9)
    val kept = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"short doc must not pass unscored, got $kept")
  }

  test("end-to-end stream: foreachBatch wiring gates a live feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dir = graft.Staging.dirFor("dsir-gate-e2e")
    val ckpt = graft.Staging.dirFor("dsir-gate-ckpt")
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().take(60)
    val q = DsirGate.start(mem.toDF().toDF("doc_id", "text"), dir, ckpt,
      "doc_id", "text", frozen, threshold = 0.0)
    try {
      mem.addData(rows.take(30).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.drop(30).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet
    val ids = rows.map(_._1).toSeq
    val batch = Dsir.logWeights(
        docs.filter(col("doc_id").isin(ids: _*)), "doc_id", "text",
        frozen.thaw(spark))
      .filter(col("logw") >= 0.0).select("id").as[Long].collect().toSet
    assert(streamed == batch)
  }
}
