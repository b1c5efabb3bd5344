package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality EVALUATION and RE-RANKING — the serving-side
  * companions to the ANN index families. Every pruned index in the
  * repo quotes a recall number in its spec; [[rankingMetrics]] makes
  * those numbers a first-class, oracle-checkable RELATION (recall@k,
  * reciprocal rank, nDCG@k of a system ranking against the exact
  * ground truth), and [[mmr]] is the standard diversity re-rank a
  * production retrieval stack runs over a ranker's top-m shortlist.
  *
  * Cross-engine determinism stance (the [[Hybrid]] conventions): every
  * ranking this file consumes is 4-dp rounded with ties broken on id;
  * DCG gains are embedded as EXACT integers (micro-gain longs), so
  * every per-query sum is order-independent integer arithmetic and the
  * only floating-point steps are single IEEE divisions — replayable in
  * any engine from the same literals.
  */
object Retrieval {

  /** DCG gain table as exact integers: gain(r) = round(10⁶ / log₂(r+1))
    * for ranks 1..k. Computed ONCE driver-side and embedded as literals
    * in both the Spark plan and the DuckDB oracle — integer sums are
    * exact and order-independent, so the engines cannot diverge on
    * accumulation order the way per-row `1/log2(r+1)` double sums can. */
  def dcgGainsMicro(k: Int): Array[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))
      .toArray

  /** Per-query ranking-quality metrics of a SYSTEM top-k list against
    * the exact ground-truth top-k: for each qid,
    *   - hits      = |sys@k ∩ gt@k| (integer),
    *   - recall    = hits / |gt@k| (the ground truth can hold fewer
    *                 than k entries on a small corpus — normalizing by
    *                 k would report false drift for a provably exact
    *                 probe, the [[graft.streaming.RecallStream]]
    *                 cold-start case),
    *   - rr        = 1 / rank_sys(gt's rank-1 id), 0 if the true
    *                 nearest neighbor is absent from sys@k (per-query
    *                 reciprocal rank — averaging these IS MRR),
    *   - ndcg      = DCG@k / IDCG@|gt@k| with binary relevance over
    *                 gt@k membership, gains from [[dcgGainsMicro]]
    *                 (the ideal list holds exactly the |gt@k| relevant
    *                 docs, so IDCG is the gain prefix-sum at |gt@k|).
    * Both inputs are (qid, id, rank) relations with rank ∈ [1, k'];
    * rows beyond k are ignored. A query with zero overlap still emits
    * its row (metrics 0) — silence is not a score. The row DOMAIN is
    * gt-side-driven: a qid appears iff it has at least one ground-truth
    * row (the left join runs from the gt side), so a sys-only qid —
    * reachable only when the caller's ground truth is empty for a
    * standing query, i.e. an empty corpus slice — emits nothing rather
    * than a zero row; its metrics would be 0/0. All aggregation is
    * integer; each metric is one IEEE division of exact integers, so
    * the relation replays bit-identically in DuckDB from the same gain
    * literals (the `q_retrieval_eval` oracle). Scale shape: inputs are
    * top-k lists — model-sized per query by construction — so every
    * join and group-by here is bounded by |queries|·k rows regardless
    * of corpus size; the heavy lifting stays inside the rankers. */
  def rankingMetrics(sys: DataFrame, gt: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val gains = dcgGainsMicro(k)
    val idcgPrefix = gains.scanLeft(0L)(_ + _).tail // idcg at |gt| = 1..k
    val gainAt: Column = element_at(
      array(gains.map(lit(_)): _*), col("srk").cast("int"))
    val idcgAt: Column = element_at(
      array(idcgPrefix.map(lit(_)): _*), col("gtn").cast("int"))
    val sysK = sys.filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank").as("srk"))
    val gtK = gt.filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank").as("grk"))
    val per = sysK.join(gtK, Seq("qid", "id"))
      .groupBy("qid")
      .agg(count(lit(1)).as("hits0"),
        sum(gainAt).as("dcg"),
        max(when(col("grk") === 1, lit(1.0) / col("srk"))).as("rr0"))
    gtK.groupBy("qid").agg(count(lit(1)).as("gtn"))
      .join(per, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("hits0"), lit(0L)).as("hits"),
        (coalesce(col("hits0"), lit(0L)).cast("double") / col("gtn"))
          .as("recall"),
        coalesce(col("rr0"), lit(0.0)).as("rr"),
        (coalesce(col("dcg"), lit(0L)).cast("double") / idcgAt).as("ndcg"))
  }

  /** The 4-dp pairwise cosine matrix over a candidate-vector shortlist
    * (id, vec) — the `sims` input [[mmr]] consumes, kept in ONE place
    * so the rounding/orientation contract cannot drift between the
    * MMR query, the pipeline flagship, and their specs. Emits each
    * unordered pair once (id1 < id2); [[mmr]] looks up both
    * orientations. m(m−1)/2 rows for an m-row shortlist — model-sized. */
  def pairwiseSims(candVecs: DataFrame): DataFrame = {
    val cv = candVecs.select(col("id"), col("vec"))
    cv.toDF("id1", "v1")
      .join(cv.toDF("id2", "v2"), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        round(graft.ops.Similarity.cosine(col("v1"), col("v2")), 4).as("sim"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998) — the standard diversity pass over a ranker's top-m
    * shortlist: greedily pick k documents maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` against the already-picked
    * set S (first pick: the relevance term alone — the max over an
    * empty S is 0, the paper's convention). Near-identical shortlist
    * entries stop crowding the answer: the second copy's sim penalty
    * defers it behind genuinely different material.
    *
    * `candidates` is (id, rel) — the top-m of any ranker, rel rounded
    * 4 dp; `sims` is (id1, id2, sim) pairwise 4-dp similarities over
    * the SAME m candidates (both orientations or either — lookups fall
    * back to 0 for absent pairs, which only arises if the caller under-
    * supplies the matrix). The greedy fold runs DRIVER-side over the
    * collected m + m² rows — MODEL-sized by construction (m ≈ 10–1000,
    * the [[Hybrid]] stance: re-ranking consumes a shortlist, never the
    * corpus; the heavy lifting stays in the ANN ranker's bucket-pruned
    * plan). Determinism: scores are `round(λ·rel − (1−λ)·maxSim, 6)`
    * via the exact BigDecimal HALF_UP rule Spark's `round` uses, on
    * doubles produced by single IEEE ops over 4-dp inputs; ties break
    * on id — the `q_retrieval_mmr` oracle replays every pick as an
    * unrolled stage. Output: (rank, id, rel, mmr), rank ∈ [1, k]. */
  def mmr(candidates: DataFrame, sims: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val oneMinus = 1.0 - lambda
    val rel: Map[Long, Double] = candidates
      .select(col("id").cast("long"), col("rel").cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sim: Map[(Long, Long), Double] = sims
      .select(col("id1").cast("long"), col("id2").cast("long"),
        col("sim").cast("double"))
      .collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getDouble(2),
        (r.getLong(1), r.getLong(0)) -> r.getDouble(2)))
      .toMap
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    var remaining = rel.keySet
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      val scored = remaining.toSeq.map { id =>
        val maxSim =
          if (picked.isEmpty) 0.0
          else picked.map(p => sim.getOrElse((id, p._2), 0.0)).max
        (id, round6(lambda * rel(id) - oneMinus * maxSim))
      }
      val (bestId, bestScore) = scored.minBy { case (id, s) => (-s, id) }
      picked += ((rank, bestId, rel(bestId), bestScore))
      remaining -= bestId
      rank += 1
    }
    val spark = candidates.sparkSession
    import spark.implicits._
    picked.toSeq.toDF("rank", "id", "rel", "mmr")
  }
}
