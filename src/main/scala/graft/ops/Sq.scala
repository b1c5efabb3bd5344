package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import graft.functions.{IntSqDistExpr, SqAdcExpr, SqEncodeExpr}

/** SQ8 scalar-quantized similarity search — FAISS's `ScalarQuantizer`
  * family (QT_8bit): every dimension affinely mapped to one byte against
  * per-dimension trained [min, max] bounds. Where PQ trades fidelity for
  * 32–64× compression, SQ8 keeps per-dimension resolution at a flat 4×
  * byte reduction — the standard "fast exact-ish" tier between a float32
  * flat scan and a PQ/IVF-PQ index.
  *
  * Design for 100 TB:
  *
  *   - TRAINING is one aggregation: per-dimension min/max over the
  *     corpus (posexplode → groupBy(dim) — map-side combines to ≤ d rows
  *     per task, the exchange carries partitions × d tiny rows). The
  *     bounds are a 2·d-double model parameter, collected once and
  *     shipped into codegen as reference objects ([[graft.functions.RotateProjectExpr]]'s
  *     codebooks-as-data idiom) — never a per-row join.
  *   - ENCODING is a scan-shaped projection (one codegen'd expression per
  *     row); at scale codes are written at ingest and the float column is
  *     never re-read — the scan that serves queries reads d bytes/row
  *     instead of 4d.
  *   - QUERYING broadcasts the (tiny) query side against the codes scan;
  *     the distance kernel is a fused integer loop inside whole-stage
  *     codegen; top-k is the salted two-phase [[Skew.saltedTopK]].
  *
  * Two estimators, matching FAISS:
  *   - symmetric (both sides quantized): EXACT integer arithmetic,
  *     oracle-replayable bit-for-bit (`ann_sq8` — no rounding anywhere).
  *   - asymmetric ADC (query full-precision, corpus decoded at bin
  *     midpoints): tighter recall at identical scan bytes; pinned
  *     against brute force in SqSpec.
  */
object Sq {

  /** Per-dimension training bounds. */
  final case class SqBounds(lo: Array[Double], hi: Array[Double]) {
    def dim: Int = lo.length
  }

  /** Train per-dimension [min, max] over `vecCol` (array<float|double>).
    * One aggregation pass; the collect is bounded by the dimensionality
    * (d rows), a model parameter like the k-means centroids. */
  def train(corpus: DataFrame, vecCol: String): SqBounds = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
      .collect()
    require(rows.nonEmpty, "sq train: empty corpus")
    val d = rows.map(_.getInt(0)).max + 1
    val lo = new Array[Double](d)
    val hi = new Array[Double](d)
    rows.foreach { r => lo(r.getInt(0)) = r.getDouble(1); hi(r.getInt(0)) = r.getDouble(2) }
    SqBounds(lo, hi)
  }

  /** 8-bit codes column for `vec` under `b`. */
  def encode(vec: Column, b: SqBounds): Column =
    bridge.column(SqEncodeExpr(bridge.expression(vec), b.lo, b.hi))

  /** Symmetric code-domain squared distance (both sides quantized) —
    * exact long arithmetic. */
  def symDist(qCodes: Column, codes: Column): Column =
    bridge.column(IntSqDistExpr(bridge.expression(qCodes), bridge.expression(codes)))

  /** Asymmetric distance: full-precision query vs midpoint-decoded
    * corpus codes. */
  def adcDist(qVec: Column, codes: Column, b: SqBounds): Column =
    bridge.column(SqAdcExpr(bridge.expression(qVec), bridge.expression(codes), b.lo, b.hi))

  /** Top-k by the SYMMETRIC quantized distance: both sides encoded, the
    * corpus scanned once as codes, every arithmetic step integer-exact
    * (ties broken by id). Output: (qid, id, d_code, rank).
    *
    * @param queries (qid, qvec) — small; broadcast.
    * @param corpus  (id, vec) — arbitrarily large; scanned once.
    */
  def topKSym(queries: DataFrame, corpus: DataFrame, b: SqBounds, k: Int): DataFrame = {
    val qc = queries.select(col("qid"), encode(col("qvec"), b).as("qcodes"))
    val cc = corpus.select(col("id"), encode(col("vec"), b).as("codes"))
    val scored = cc.crossJoin(broadcast(qc))
      .withColumn("d_code", symDist(col("qcodes"), col("codes")))
    Skew.saltedTopK(scored, Seq("qid"), Seq(col("d_code").asc, col("id").asc), k,
        saltBy = col("id"))
      .select(col("qid"), col("id"), col("d_code"), col("rank"))
  }

  /** Top-k by the ASYMMETRIC estimator (the production configuration:
    * one quantization error per pair). Output: (qid, id, d_adc, rank). */
  def topKAdc(queries: DataFrame, corpus: DataFrame, b: SqBounds, k: Int): DataFrame = {
    val cc = corpus.select(col("id"), encode(col("vec"), b).as("codes"))
    val scored = cc.crossJoin(broadcast(queries))
      .withColumn("d_adc", adcDist(col("qvec"), col("codes"), b))
    Skew.saltedTopK(scored, Seq("qid"), Seq(col("d_adc").asc, col("id").asc), k,
        saltBy = col("id"))
      .select(col("qid"), col("id"), col("d_adc"), col("rank"))
  }
}
