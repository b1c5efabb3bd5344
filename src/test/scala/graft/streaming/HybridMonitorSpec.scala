package graft.streaming

import graft.SparkSpec
import graft.ops.{Hybrid, TextIndex}
import graft.streaming.RecallStream.HybridQuery
import org.apache.spark.sql.functions._

/** FUSED-stack recall monitor ([[RecallStream.monitorHybridBatch]]):
  * the planted drift case only the fused metric catches (both
  * per-index monitors read green while the fused top-k loses a row),
  * the epochs-≡-flat serving identity behind
  * [[Hybrid.hybridTopKEpochs]], replay idempotence, and cold start. */
class HybridMonitorSpec extends SparkSpec {
  import spark.implicits._

  // 4 axis-aligned cells; the standing query lives in cell 0's cone
  private val centroids: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
  private val qvec = Seq(1.0f, 0.12f, 0f, 0f)

  /** The planted geometry: docs 1–4 live in PROBED cell 0; doc 5 (the
    * victim) lives in UNPROBED cell 1 with dense rank 5 (inside fusion
    * depth m=6, outside k=3 — so the dense monitor never counts it)
    * and lexical rank 3 — its two mid-list votes put it in the fused
    * exact top-3, and pruning its dense vote drops it. */
  private def corpus = Seq(
    (1L, "spark spark spark", Seq(1.0f, 0.12f, 0f, 0f)),
    (2L, "join merge", Seq(1.0f, 0.05f, 0f, 0f)),
    (3L, "merge sort", Seq(1.0f, 0f, 0f, 0.3f)),
    (4L, "spark spark join", Seq(1.0f, 0f, 0f, 0.6f)),
    (5L, "spark join", Seq(0.55f, 0.6f, 0f, 0f))
  ).toDF("id", "text", "vec")

  private val standing = Seq(HybridQuery(7L, Seq("spark"), qvec.map(_.toFloat)))

  test("planted drift: per-index monitors green, only the FUSED metric sees the lost row") {
    val root = graft.Staging.dirFor("hybrid-monitor-drift")
    // per-index check 1 — the dense monitor at the same pruning:
    // exact dense top-3 all sit in the probed cell, recall 1.0
    val annMetrics = RecallStream.monitorBatch(
      corpus.select(col("id"), col("vec")), 0L, s"$root/ann-solo",
      s"$root/ann-solo-metrics",
      Seq((7L, qvec)).toDF("qid", "qvec"), centroids, k = 3, nProbe = 1)
    assert(annMetrics.select("recall").as[Double].head() == 1.0,
      "the dense per-index monitor must be green by construction")
    // per-index check 2 — the lexical store is exact by construction
    TextIndex.appendPostingsEpoch(corpus, "id", "text",
      s"$root/lex-solo", epoch = 0L)
    val lexEpochs = TextIndex.bm25TopKEpochs(spark, s"$root/lex-solo",
      Seq("spark"), k = 6).as[(Long, Double, Int)].collect().toSeq
    val lexInline = TextIndex.bm25TopK(corpus, "id", "text",
      Seq("spark"), k = 6).as[(Long, Double, Int)].collect().toSeq
    assert(lexEpochs == lexInline, "the lexical side has no pruning loss")
    // the FUSED monitor at the same stores' configuration
    val fused = RecallStream.monitorHybridBatch(corpus, 0L,
      s"$root/lex", s"$root/ann", s"$root/raw", s"$root/metrics",
      standing, centroids, k = 3, m = 6, nProbe = 1)
    val recall = fused.select("recall").as[Double].head()
    assert(math.abs(recall - 2.0 / 3) < 1e-9,
      s"fused recall must show the lost victim row, got $recall")
    // and the lost row is exactly the planted victim
    val qv = Seq(Tuple1(qvec)).toDF("qvec")
    val exactIds = Hybrid.hybridTopK(corpus, "id", "text", "vec",
      Seq("spark"), qv, k = 3, m = 6).select("id").as[Long].collect().toSet
    val prunedIds = Hybrid.hybridTopKEpochs(spark, s"$root/lex",
      s"$root/ann", centroids, Seq("spark"), qv, k = 3, m = 6, nProbe = 1)
      .select("id").as[Long].collect().toSet
    assert(exactIds -- prunedIds == Set(5L), "victim must be doc 5")
    assert((exactIds intersect prunedIds).size == 2)
  }

  test("epochs serving ≡ flat serving; replay idempotent; cold start emits empty metrics") {
    val root = graft.Staging.dirFor("hybrid-monitor-epochs")
    // cold start: an all-duplicate/empty first epoch serves nothing
    val cold = RecallStream.monitorHybridBatch(
      corpus.limit(0), 0L, s"$root/lex", s"$root/ann", s"$root/raw",
      s"$root/metrics", standing, centroids, k = 3, m = 6, nProbe = 1)
    assert(cold.count() == 0L, "cold start must emit the empty relation")
    // two epochs by id parity
    RecallStream.monitorHybridBatch(corpus.filter($"id" % 2 === 0), 1L,
      s"$root/lex", s"$root/ann", s"$root/raw", s"$root/metrics",
      standing, centroids, k = 3, m = 6, nProbe = 1)
    val m2 = RecallStream.monitorHybridBatch(corpus.filter($"id" % 2 =!= 0), 2L,
      s"$root/lex", s"$root/ann", s"$root/raw", s"$root/metrics",
      standing, centroids, k = 3, m = 6, nProbe = 1)
      .orderBy("qid").collect().toSeq
    // replaying the last epoch changes nothing (overwrite-by-epoch +
    // own-partition exclusion)
    val replayed = RecallStream.monitorHybridBatch(corpus.filter($"id" % 2 =!= 0), 2L,
      s"$root/lex", s"$root/ann", s"$root/raw", s"$root/metrics",
      standing, centroids, k = 3, m = 6, nProbe = 1)
      .orderBy("qid").collect().toSeq
    assert(replayed == m2, "epoch replay must be idempotent")
    // the epoch-maintained fused path answers exactly like flat stores
    // built fresh over the same corpus
    val qv = Seq(Tuple1(qvec)).toDF("qvec")
    val flat = graft.Staging.dirFor("hybrid-monitor-flat")
    TextIndex.writePostings(corpus, "id", "text", s"$flat/lex")
    graft.ops.IvfIndex.writeIndexed(
      corpus.select(col("id"), col("vec")), centroids, s"$flat/ann")
    val viaEpochs = Hybrid.hybridTopKEpochs(spark, s"$root/lex",
        s"$root/ann", centroids, Seq("spark"), qv, k = 3, m = 6, nProbe = 1)
      .as[(Long, Double, Int)].collect().toSeq
    val viaFlat = Hybrid.hybridTopKIndexed(spark, s"$flat/lex",
        s"$flat/ann", centroids, Seq("spark"), qv, k = 3, m = 6, nProbe = 1)
      .as[(Long, Double, Int)].collect().toSeq
    assert(viaEpochs == viaFlat,
      "epoch-maintained fused serving must equal the flat rebuild's")
  }
}
