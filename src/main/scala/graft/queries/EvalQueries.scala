package graft.queries

import graft.Tables
import graft.ops.{Retrieval, Similarity, Skew}
import org.apache.spark.sql.functions._

/** Eighth wave of the query surface (round 17, second half): the
  * retrieval-QUALITY layer — ranking metrics of a pruned index against
  * the exact ground truth, MMR diversity re-ranking of a shortlist,
  * and the simhash family's incremental (Manku-blocked) probe. Same
  * oracle conventions as [[QueryCatalog]]: identical aliases both
  * sides, total ORDER BY, integer outputs CAST to BIGINT in DuckDB,
  * scores rounded 4 dp before every ranking, greedy/fused scores
  * rounded 6 dp.
  */
object EvalQueries {
  import QueryCatalog.Q

  private val EvalK = 10

  /** Retrieval-quality metrics ([[graft.ops.Retrieval.rankingMetrics]])
    * of the seed-42 LSH ANN list (the `ann_lsh` configuration — 4-bit
    * buckets × 16 tables) against the exact brute-force top-10, per
    * standing query: recall@10, reciprocal rank of the true nearest
    * neighbor, nDCG@10 over the integer micro-gain table. The oracle
    * replays BOTH rankings (the `ann_topk` and `ann_lsh` chains — each
    * independently hash-green) and every metric from the same embedded
    * gain literals; all aggregation is integer, each metric one IEEE
    * division. */
  val qRetrievalEval: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val sys = Similarity.lshTopK(queries, corpus, k = EvalK, dim = 64,
      bitsPerTable = 4, tables = 16)
    val gt = Similarity.bruteForceTopK(queries, corpus, k = EvalK)
    Retrieval.rankingMetrics(sys, gt, EvalK).orderBy(col("qid"))
  }

  /** The metric fold shared by every eval oracle: given an upstream
    * `sysk(qid, id, rank)` CTE and the ground-truth chain's `gtscored`,
    * replay hits/recall/rr/ndcg from the embedded integer gain table. */
  private def metricsTailSql: String = {
    val gains = Retrieval.dcgGainsMicro(EvalK)
    val gainsLit = gains.mkString("[", ", ", "]")
    val idcg = gains.sum
    s"""gtk AS (SELECT qid, id, rank FROM gtscored WHERE rank <= $EvalK),
       |m AS (
       |  SELECT s.qid AS qid, count(*) AS hits0,
       |    sum(list_extract($gainsLit, s.rank)) AS dcg,
       |    max(CASE WHEN g.rank = 1 THEN CAST(1 AS DOUBLE) / s.rank END) AS rr0
       |  FROM sysk s JOIN gtk g ON s.qid = g.qid AND s.id = g.id
       |  GROUP BY s.qid)
       |SELECT qids.qid AS qid, CAST(coalesce(hits0, 0) AS BIGINT) AS hits,
       |  CAST(coalesce(hits0, 0) AS DOUBLE) / $EvalK AS recall,
       |  CAST(coalesce(rr0, 0) AS DOUBLE) AS rr,
       |  CAST(coalesce(dcg, 0) AS DOUBLE) / $idcg AS ndcg
       |FROM (SELECT DISTINCT qid FROM gtk) qids LEFT JOIN m USING (qid)
       |ORDER BY qid""".stripMargin
  }

  val qRetrievalEvalSql: String =
    s"""WITH ${QueryCatalog.annQcCtes},
       |${QueryCatalog.annGtScoredCte},
       |${QueryCatalog.annLshScoredCtes},
       |sysk AS (SELECT qid, id, rank FROM lshscored WHERE rank <= $EvalK),
       |$metricsTailSql""".stripMargin

  /** [[qRetrievalEval]] pointed at the GRAPH-ANN family: the same
    * metric relation over [[graft.ops.NnDescent.searchGraph]]'s beam
    * walk (the `ann_graph_search` configuration) instead of the LSH
    * list — every serving family's spec-quoted recall now has an
    * oracle-checked audit. The oracle composes the FULL graph replay
    * (NN-Descent build + every search hop) with the brute-force chain
    * and the shared metric fold. */
  val qRetrievalEvalGraph: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val g = graft.ops.NnDescent.knnGraph(corpus, k = 5, iters = 2,
      sample = 10, seed = "nnd")
    val sys = graft.ops.NnDescent.searchGraph(g, corpus, queries,
      k = EvalK, entries = ServeQueries.SearchEntries,
      beam = ServeQueries.SearchBeam, hops = ServeQueries.SearchHops,
      seed = "nnd")
    val gt = Similarity.bruteForceTopK(queries, corpus, k = EvalK)
    Retrieval.rankingMetrics(sys, gt, EvalK).orderBy(col("qid"))
  }

  val qRetrievalEvalGraphSql: String =
    s"""WITH ${CorpusMlQueries.knnGraphCtesBody(" WHERE vec_id >= 5")},
       |${ServeQueries.graphSearchCtes},
       |${QueryCatalog.annQcCtes},
       |${QueryCatalog.annGtScoredCte},
       |sysk AS (
       |  SELECT qid, id, rank FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
       |    FROM v${ServeQueries.SearchHops}) WHERE rank <= $EvalK),
       |$metricsTailSql""".stripMargin

  /** [[qRetrievalEval]] pointed at the IVF family — the third audited
    * ranker (LSH, graph, IVF): the seeded 16-cell quantizer (the
    * SemDeDup oracle's replay idiom — argmax with ties to the larger
    * index, the exact [[graft.ops.IvfIndex.bestCell]] rule) serves the
    * standing queries from ONE probed cell each, the production
    * nProbe = 1 configuration whose recall loss is precisely what this
    * audit exists to see. The oracle replays cell assignment from the
    * embedded unit-centroid literals, the cell-restricted raw-cosine
    * ranking, the exact chain, and the shared metric fold. */
  val qRetrievalEvalIvf: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = QueryCatalog.semanticCentroids
    val cc = graft.ops.IvfIndex.assignCells(corpus, "id", "vec", cents)
    val qc = queries.withColumn("cell",
      graft.ops.IvfIndex.bestCell(col("qvec"), cents))
    val scored = cc.join(qc, Seq("cell"))
      .select(col("qid"), col("id"),
        Similarity.cosine(col("qvec"), col("vec")).as("score"))
    val sys = Skew.saltedTopK(scored, Seq("qid"),
      Seq(col("score").desc, col("id").asc), EvalK, saltBy = col("id"))
    val gt = Similarity.bruteForceTopK(queries, corpus, k = EvalK)
    Retrieval.rankingMetrics(sys, gt, EvalK).orderBy(col("qid"))
  }

  val qRetrievalEvalIvfSql: String = {
    val cs = graft.ops.IvfIndex.unitRows(QueryCatalog.semanticCentroids)
    val csLit = cs.map(_.mkString("[", ", ", "]"))
      .mkString("[", ",\n      ", "]")
    s"""WITH cents AS (SELECT $csLit AS cs),
       |${QueryCatalog.annQcCtes},
       |${QueryCatalog.annGtScoredCte},
       |cc AS (
       |  SELECT id, vec,
       |    len(s) - list_position(list_reverse(s), list_max(s)) AS cell
       |  FROM (SELECT id, vec, list_transform(cs, x -> list_dot_product(vec, x)) AS s
       |        FROM c CROSS JOIN cents)),
       |qc AS (
       |  SELECT qid, qvec,
       |    len(s) - list_position(list_reverse(s), list_max(s)) AS cell
       |  FROM (SELECT qid, qvec, list_transform(cs, x -> list_dot_product(qvec, x)) AS s
       |        FROM q CROSS JOIN cents)),
       |ivfscored AS (
       |  SELECT qc.qid AS qid, cc.id AS id,
       |    row_number() OVER (PARTITION BY qc.qid ORDER BY
       |      list_dot_product(qc.qvec, cc.vec) /
       |        (sqrt(list_dot_product(qc.qvec, qc.qvec)) *
       |         sqrt(list_dot_product(cc.vec, cc.vec))) DESC, cc.id) AS rank
       |  FROM cc JOIN qc ON cc.cell = qc.cell),
       |sysk AS (SELECT qid, id, rank FROM ivfscored WHERE rank <= $EvalK),
       |$metricsTailSql""".stripMargin
  }

  private val MmrK = 10
  private val MmrM = 20
  private val MmrLambda = 0.7

  /** MMR diversity re-rank ([[graft.ops.Retrieval.mmr]], Carbonell &
    * Goldstein SIGIR'98) of the top-20 cosine shortlist for standing
    * query vector 0 over the corpus slice (vec_id ≥ 5): greedy 10
    * picks maximizing λ·rel − (1−λ)·max-sim-to-picked at λ = 0.7,
    * 4-dp relevance/similarity inputs, 6-dp greedy scores, ties by id.
    * The oracle replays the shortlist, the pairwise similarity matrix,
    * and EVERY greedy pick as an unrolled stage — the graph-search
    * hop-replay stance applied to re-ranking. */
  val qRetrievalMmr: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val scored = corpus.crossJoin(broadcast(qv))
      .select(lit(0).as("qid"), col("id"), col("vec"),
        round(Similarity.cosine(col("vec"), col("qvec")), 4).as("rel"))
    val cands = Skew.saltedTopK(scored, Seq("qid"),
      Seq(col("rel").desc, col("id").asc), MmrM, saltBy = col("id"))
    val cv = cands.select(col("id"), col("vec"))
    val sims = cv.toDF("id1", "v1")
      .join(cv.toDF("id2", "v2"), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(Similarity.cosine(col("v1"), col("v2")), 4).as("sim"))
    Retrieval.mmr(cands.select(col("id"), col("rel")), sims,
        k = MmrK, lambda = MmrLambda)
      .orderBy(col("rank"))
  }

  // λ and (1−λ) as the EXACT doubles the Scala fold uses: the SQL
  // recomputes 1−λ in double, never parses a 17-digit literal.
  private val L = s"CAST($MmrLambda AS DOUBLE)"
  private val OM = s"(CAST(1 AS DOUBLE) - CAST($MmrLambda AS DOUBLE))"

  private def cosSql(a: String, b: String) =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** The pairwise-similarity + greedy-stage replay shared by the MMR
    * oracles: requires a CTE `cand(id, vec, rel)` upstream, emits
    * `sims/sims2/sel1..sel$k` (every stage MATERIALIZED — each stage is
    * referenced three times by the next, so inlining would re-derive
    * the candidate chain exponentially). Ends in `sel$k(id, rel, mmr,
    * rank)`. */
  private[queries] def mmrStagesSql(k: Int): String = {
    val stages = (2 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT id, rel, mmr, $i AS rank FROM (
         |    SELECT c.id, c.rel, round($L * c.rel - $OM * ms.m, 6) AS mmr,
         |      row_number() OVER (ORDER BY round($L * c.rel - $OM * ms.m, 6) DESC, c.id) AS rn
         |    FROM cand c JOIN (
         |      SELECT s2.id1 AS id, max(s2.sim) AS m
         |      FROM sims2 s2 JOIN sel${i - 1} p ON s2.id2 = p.id
         |      GROUP BY s2.id1) ms ON ms.id = c.id
         |    WHERE c.id NOT IN (SELECT id FROM sel${i - 1})) WHERE rn = 1),
         |sel$i AS MATERIALIZED (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""sims AS MATERIALIZED (
       |  SELECT a.id AS id1, b.id AS id2, round(${cosSql("a.vec", "b.vec")}, 4) AS sim
       |  FROM cand a JOIN cand b ON a.id < b.id),
       |sims2 AS MATERIALIZED (
       |  SELECT id1, id2, sim FROM sims
       |  UNION ALL SELECT id2 AS id1, id1 AS id2, sim FROM sims),
       |sel1 AS MATERIALIZED (
       |  SELECT id, rel, round($L * rel, 6) AS mmr, 1 AS rank FROM (
       |    SELECT id, rel, row_number() OVER (ORDER BY round($L * rel, 6) DESC, id) AS rn
       |    FROM cand) WHERE rn = 1),
       |$stages""".stripMargin
  }

  val qRetrievalMmrSql: String =
    s"""WITH qv AS (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
       |  FROM embeddings WHERE vec_id = 0),
       |corp AS (
       |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
       |  FROM embeddings WHERE vec_id >= 5),
       |cand AS MATERIALIZED (
       |  SELECT id, vec, rel FROM (
       |    SELECT id, vec, round(${cosSql("qvec", "vec")}, 4) AS rel,
       |      row_number() OVER (ORDER BY round(${cosSql("qvec", "vec")}, 4) DESC, id) AS rn
       |    FROM corp CROSS JOIN qv) WHERE rn <= $MmrM),
       |${mmrStagesSql(MmrK)}
       |SELECT rank, id, rel, mmr FROM sel$MmrK ORDER BY rank""".stripMargin

  private val PipeCand = 15
  private val PipeK = 8

  /** The composed SERVING flagship — the full production retrieval
    * path in one hash-gated relation (the serving-side analogue of
    * `corpus_pipeline_v5`): hybrid BM25 + vector fusion
    * ([[graft.ops.Hybrid.hybridTopK]], RRF) produces the top-15
    * candidate shortlist; the shortlist is re-scored by 4-dp cosine to
    * the query (rank fusion finds the candidates, semantic relevance
    * drives diversification — RRF scores are rank reciprocals on a
    * scale MMR's λ-mix cannot meaningfully trade against a cosine);
    * MMR then picks the final 8 diverse answers. Every stage is
    * model-sized after the rankers: the oracle replays the whole
    * composition — both rankers, the fusion, the re-score, the
    * pairwise matrix, and every greedy pick — in ONE DuckDB query. */
  val qRetrievalPipeline: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val corpus = Tables.documents(s, dir)
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
      .filter(col("doc_id") >= 5)
    val qv = emb.filter(col("vec_id") === 3)
      .select(col("embedding").as("qvec"))
    val fusedIds = graft.ops.Hybrid.hybridTopK(corpus, "doc_id", "text",
        "embedding", Seq("spark", "window", "merge"), qv,
        k = PipeCand, m = MmrM)
      .select("id")
    val candVecs = corpus
      .select(col("doc_id").as("id"), col("embedding").as("vec"))
      .join(fusedIds, Seq("id"), "left_semi")
    val cands = candVecs.crossJoin(broadcast(qv))
      .select(col("id"),
        round(Similarity.cosine(col("vec"), col("qvec")), 4).as("rel"))
    val cv = candVecs.select(col("id"), col("vec"))
    val sims = cv.toDF("id1", "v1")
      .join(cv.toDF("id2", "v2"), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(Similarity.cosine(col("v1"), col("v2")), 4).as("sim"))
    Retrieval.mmr(cands, sims, k = PipeK, lambda = MmrLambda)
      .orderBy(col("rank"))
  }

  val qRetrievalPipelineSql: String =
    s"""WITH ${LifecycleQueries.hybridFusedCtes(PipeCand, MmrM)},
       |cand AS MATERIALIZED (
       |  SELECT c.doc_id AS id, c.vec AS vec,
       |    round(${cosSql("qv.qvec", "c.vec")}, 4) AS rel
       |  FROM hyb h JOIN corpus c ON c.doc_id = h.id CROSS JOIN qv),
       |${mmrStagesSql(PipeK)}
       |SELECT rank, id, rel, mmr FROM sel$PipeK ORDER BY rank""".stripMargin

  /** Incremental SIMHASH near-dup probe
    * ([[graft.ops.Dedup.writeSimhashIndex]] +
    * [[graft.ops.Dedup.newVsCorpusSimhash]], Manku WWW'07): the corpus
    * (doc_id % 5 ≠ 0) persists its blocked 60-bit signature store once;
    * the "day's batch" (doc_id % 5 = 0) is signed and probed by block
    * equality — LOSSLESS at Hamming ≤ 3 with 4 blocks (pigeonhole), so
    * the oracle is the brute-force cross-split Hamming join over
    * independently recomputed signatures. */
  val dedupSimhashInc: Q = (s, dir) => {
    val idxDir = graft.Staging.dirFor("simhash-index")
    graft.ops.Dedup.writeSimhashIndex(
      Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", idxDir)
    graft.ops.Dedup.newVsCorpusSimhash(s, idxDir,
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
        "doc_id", "text")
      .orderBy(col("dist"), col("id1"), col("id2"))
  }

  val dedupSimhashIncSql: String =
    s"""WITH ${QueryCatalog.simhashSigsCtes("b", " WHERE doc_id % 5 = 0")},
       |${QueryCatalog.simhashSigsCtes("c", " WHERE doc_id % 5 <> 0")}
       |SELECT b.doc_id AS id1, c.doc_id AS id2,
       |  CAST(bit_count(xor(b.sig, c.sig)) AS BIGINT) AS dist
       |FROM bsigs b JOIN csigs c ON bit_count(xor(b.sig, c.sig)) <= 3
       |ORDER BY dist, id1, id2""".stripMargin

  val all: Map[String, Q] = Map(
    "q_retrieval_eval" -> qRetrievalEval,
    "q_retrieval_eval_graph" -> qRetrievalEvalGraph,
    "q_retrieval_eval_ivf" -> qRetrievalEvalIvf,
    "q_retrieval_mmr" -> qRetrievalMmr,
    "q_retrieval_pipeline" -> qRetrievalPipeline,
    "dedup_simhash_inc" -> dedupSimhashInc)

  val oracles: Map[String, String] = Map(
    "q_retrieval_eval" -> qRetrievalEvalSql,
    "q_retrieval_eval_graph" -> qRetrievalEvalGraphSql,
    "q_retrieval_eval_ivf" -> qRetrievalEvalIvfSql,
    "q_retrieval_mmr" -> qRetrievalMmrSql,
    "q_retrieval_pipeline" -> qRetrievalPipelineSql,
    "dedup_simhash_inc" -> dedupSimhashIncSql)
}
