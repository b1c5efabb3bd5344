package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics ([[Retrieval.rankingMetrics]]): the
  * hand-computed case, the perfect/disjoint extremes, rank-position
  * sensitivity of nDCG, and the real-corpus LSH-vs-exact audit. */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private def lists(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "id", "rank")

  test("hand case: hits, recall, rr, ndcg from the integer gain table") {
    val gt = lists((1L, 100L, 1L), (1L, 101L, 2L), (1L, 102L, 3L))
    val sys = lists((1L, 101L, 1L), (1L, 999L, 2L), (1L, 100L, 3L))
    val out = Retrieval.rankingMetrics(sys, gt, k = 3)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.length == 1)
    val (_, hits, recall, rr, ndcg) = out.head
    assert(hits == 2L)
    assert(recall == 2.0 / 3)
    // gt's rank-1 doc (100) sits at sys rank 3
    assert(rr == 1.0 / 3)
    val g = Retrieval.dcgGainsMicro(3) // 1000000, 630930, 500000
    assert(g.toSeq == Seq(1000000L, 630930L, 500000L))
    // matched sys ranks: 1 (doc 101) and 3 (doc 100)
    assert(ndcg == (g(0) + g(2)).toDouble / g.sum)
  }

  test("perfect ranking scores all-ones; disjoint lists score zeros but still emit the row") {
    val gt = lists((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
    val sys = lists((1L, 10L, 1L), (1L, 11L, 2L), (2L, 98L, 1L), (2L, 99L, 2L))
    val out = Retrieval.rankingMetrics(sys, gt, k = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1.0, 1.0, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0, 0.0, 0.0)),
      "zero-overlap query must still emit its row")
  }

  test("ndcg rewards POSITION: same membership, better placement, higher score") {
    val gt = lists((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
    val early = lists((1L, 10L, 1L), (1L, 11L, 2L), (1L, 99L, 3L))
    val late = lists((1L, 98L, 1L), (1L, 10L, 2L), (1L, 11L, 3L))
    def ndcg(sys: org.apache.spark.sql.DataFrame) =
      Retrieval.rankingMetrics(sys, gt, k = 3)
        .select("ndcg").as[Double].head()
    assert(ndcg(early) > ndcg(late),
      "two hits at ranks 1-2 must outscore the same hits at ranks 2-3")
  }

  test("real corpus: LSH audit emits one in-range row per standing query, recall consistent with hits") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val sys = Similarity.lshTopK(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 16)
    val gt = Similarity.bruteForceTopK(queries, corpus, k = 10)
    val out = Retrieval.rankingMetrics(sys, gt, k = 10)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).toSet == Set(0L, 1L, 2L, 3L, 4L))
    out.foreach { case (qid, hits, recall, rr, ndcg) =>
      assert(hits >= 0 && hits <= 10)
      assert(recall == hits / 10.0, s"qid=$qid recall must be hits/k")
      assert(rr >= 0.0 && rr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
    }
    // the coarse-bucket config is a real retriever on this corpus, not
    // a coin flip: SimilaritySpec pins per-config recall, here we only
    // need the audit to SEE it
    assert(out.map(_._3).sum / out.length > 0.2,
      "mean recall@10 of the ann_lsh config should clear a weak floor")
  }

  test("multi-probe audit: probing strictly widens candidates, so audited recall dominates the single-probe base") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val gt = Similarity.bruteForceTopK(queries, corpus, k = 10)
    def meanRecall(sys: org.apache.spark.sql.DataFrame) =
      Retrieval.rankingMetrics(sys, gt, k = 10)
        .agg(avg($"recall")).as[Double].head()
    val base = meanRecall(Similarity.lshTopK(queries, corpus, k = 10,
      dim = 64, bitsPerTable = 4, tables = 8))
    val mp = meanRecall(Similarity.lshTopKMultiProbe(queries, corpus,
      k = 10, dim = 64, bitsPerTable = 4, tables = 8, nProbes = 3))
    assert(mp >= base - 1e-9,
      s"multi-probe candidates are a superset of base candidates: $mp vs $base")
    assert(mp > 0.0)
  }

  test("graph-ANN audit: the same metric relation over the beam walk, one row per query") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val g = NnDescent.knnGraph(corpus, k = 5, iters = 2, sample = 10,
      seed = "nnd")
    val sys = NnDescent.searchGraph(g, corpus, queries, k = 10,
      entries = 3, beam = 5, hops = 3, seed = "nnd")
    val gt = Similarity.bruteForceTopK(queries, corpus, k = 10)
    val out = Retrieval.rankingMetrics(sys, gt, k = 10)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).toSet == Set(0L, 1L, 2L, 3L, 4L))
    out.foreach { case (_, hits, recall, rr, ndcg) =>
      assert(hits >= 0 && hits <= 10 && recall == hits / 10.0)
      assert(rr >= 0.0 && rr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0)
    }
    assert(out.map(_._3).sum > 0.0,
      "the walk must retrieve SOME true neighbors on this corpus")
  }
}
