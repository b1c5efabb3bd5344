package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fifth wave of the query surface (round 15): the corpus-ML family —
  * scalar-quantized similarity search (SQ8, the third FAISS index
  * family next to IVF and PQ), DSIR importance resampling (Xie et al.
  * NeurIPS'23 — target-domain data selection), BPE tokenizer training
  * and encoding over the corpus, and a Zipf-law fit of the token
  * distribution. Same oracle conventions as [[QueryCatalog]]: identical
  * column aliases both sides, total ORDER BY, integer outputs CAST to
  * BIGINT in DuckDB; where a query's arithmetic is all-integer (the SQ8
  * code domain) the output carries NO rounding at all.
  */
object CorpusMlQueries {
  import QueryCatalog.Q

  /** SQ8 ANN in the symmetric code domain ([[graft.ops.Sq]]): train
    * per-dimension byte bounds, encode BOTH sides, rank by the exact
    * integer code-domain distance. Unlike the `ann_pq`/`ann_ivfpq`
    * exhaustive gates (which collapse to brute force and so test only
    * the shortlist plumbing), this oracle replays the ESTIMATOR itself
    * — per-dim min/max, the floor/clamp encode, the integer distance —
    * so a one-code divergence anywhere fails the hash. Every value is
    * integer-exact; no rounding (the round-14 ADVICE note on 4-dp ties,
    * applied). */
  val annSq8: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val b = graft.ops.Sq.train(corpus, "vec")
    graft.ops.Sq.topKSym(queries, corpus, b, k = 10)
      .orderBy(col("qid"), col("rank"))
  }

  val annSq8Sql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS vec FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 5),
      |dims AS (SELECT unnest(range(1, (SELECT min(len(vec)) FROM c) + 1)) AS dim),
      |cx AS (SELECT id, dim, CAST(vec[dim] AS DOUBLE) AS x FROM c CROSS JOIN dims),
      |stats AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM cx GROUP BY dim),
      |cc AS (
      |  SELECT id, dim,
      |    CASE WHEN hi <= lo THEN 0
      |         ELSE CAST(least(greatest(floor((x - lo) * 255.0 / (hi - lo)), 0.0), 255.0) AS BIGINT)
      |    END AS code
      |  FROM cx JOIN stats USING (dim)),
      |qx AS (SELECT qid, dim, CAST(vec[dim] AS DOUBLE) AS x FROM q CROSS JOIN dims),
      |qc AS (
      |  SELECT qid, dim,
      |    CASE WHEN hi <= lo THEN 0
      |         ELSE CAST(least(greatest(floor((x - lo) * 255.0 / (hi - lo)), 0.0), 255.0) AS BIGINT)
      |    END AS code
      |  FROM qx JOIN stats USING (dim)),
      |d AS (
      |  SELECT qid, id, CAST(sum((qc.code - cc.code) * (qc.code - cc.code)) AS BIGINT) AS d_code
      |  FROM qc JOIN cc USING (dim) GROUP BY qid, id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d_code, id) AS rank FROM d)
      |SELECT qid, id, d_code, rank FROM ranked WHERE rank <= 10
      |ORDER BY qid, rank""".stripMargin

  val all: Map[String, Q] = Map(
    "ann_sq8" -> annSq8)

  val oracles: Map[String, String] = Map(
    "ann_sq8" -> annSq8Sql)
}
