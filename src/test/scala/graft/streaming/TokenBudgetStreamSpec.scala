package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** Frozen-tokenizer budget stream ([[TokenBudgetStream]]): twin
  * equality with the batch encoder, OOV segmentation, replay. */
class TokenBudgetStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val model = Bpe.train(docs, "text", nMerges = 10)

  private def snap(dir: String) =
    spark.read.parquet(dir)
      .select("doc_id", "n_words", "n_bpe_tokens", "bpe_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("frozen fold-of-replaces encoding ≡ the vocabulary-join encoder on in-vocab text") {
    val a = Bpe.encodeStats(docs, "doc_id", "text", model)
      .select("id", "n_words", "n_bpe_tokens", "bpe_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = Bpe.encodeStatsFrozen(docs, "doc_id", "text", model.merges)
      .select("id", "n_words", "n_bpe_tokens", "bpe_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("epochs union to exactly the batch budgets; replay rewrites identically") {
    val dir = graft.Staging.dirFor("tokbudget")
    (0 until 3).foreach { e =>
      TokenBudgetStream.statsBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === e), e.toLong, dir,
        "doc_id", "text", model.merges)
    }
    val batch = Bpe.encodeStatsFrozen(docs, "doc_id", "text", model.merges)
      .select("id", "n_words", "n_bpe_tokens", "bpe_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(snap(dir) == batch)
    TokenBudgetStream.statsBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), 1L, dir,
      "doc_id", "text", model.merges)
    assert(snap(dir) == batch, "replaying a committed epoch must change nothing")
  }

  test("an out-of-vocabulary word segments through the merges instead of dropping") {
    // train on "abab cd" text so (a,b)→ab, (ab,ab)→abab, (c,d)→cd merge;
    // then stream a doc containing unseen words
    val train = Seq((0L, "abab abab cd"), (1L, "abab cd cd")).toDF("doc_id", "text")
    val m = Bpe.train(train, "text", nMerges = 5)
    val dir = graft.Staging.dirFor("tokbudget-oov")
    // "abcd" is OOV: merges apply where they can → "ab cd" (2 tokens);
    // "xyz" is fully OOV → 3 single chars
    val b = Seq((10L, "abab abcd xyz")).toDF("doc_id", "text")
    TokenBudgetStream.statsBatch(b, 0L, dir, "doc_id", "text", m.merges)
    val row = spark.read.parquet(dir)
      .select("doc_id", "n_words", "n_bpe_tokens").as[(Long, Long, Long)].head()
    // abab→1, abcd→2 (ab + cd), xyz→3 ⇒ 6 subwords over 3 words
    assert(row == ((10L, 3L, 6L)), s"got $row")
  }

  test("end-to-end stream: foreachBatch wiring budgets a live feed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dir = graft.Staging.dirFor("tokbudget-e2e")
    val ckpt = graft.Staging.dirFor("tokbudget-ckpt")
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().take(40)
    val q = TokenBudgetStream.start(mem.toDF().toDF("doc_id", "text"), dir, ckpt,
      "doc_id", "text", model.merges)
    try {
      mem.addData(rows.take(20).toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rows.drop(20).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val ids = rows.map(_._1).toSeq
    val batch = Bpe.encodeStatsFrozen(
        docs.filter(col("doc_id").isin(ids: _*)), "doc_id", "text", model.merges)
      .select("id", "n_words", "n_bpe_tokens", "bpe_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(snap(dir) == batch)
  }
}
