package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction stage a large-scale vector pipeline runs in front of its
  * ANN index (the rotation/projection half of OPQ; FAISS's `PCAMatrix`
  * preprocessor): project `dim`-dimensional vectors onto the top-r
  * eigenvectors of their covariance, shrinking every downstream
  * distance computation and index row by dim/r while keeping most of
  * the variance.
  *
  * Architecture (the [[QuantizerRelation]] philosophy — models are
  * data, training is aggregation):
  *
  *   - The second-moment matrix is ONE map-side-combinable typed
  *     aggregation ([[Pca.MomentAgg]]): each partition accumulates
  *     n, Σv, and the upper triangle of Σ v·vᵀ into a single
  *     d(d+3)/2-long buffer, merged elementwise — one pass over the
  *     corpus, one buffer per partition across the wire, nothing
  *     row-sized shuffled. At 100 TB that is the optimal shape: the
  *     reduction is a few KB per partition regardless of row count.
  *   - INTEGER-EXACT accumulation: coordinates are quantized once to
  *     `scale` units (round(v·2¹²) — far below embedding noise) and all
  *     moments are exact Long sums of those integers, so training is a
  *     pure function of the multiset of rows: invariant under
  *     partitioning, repartitioning, and merge order — the same
  *     determinism contract as every sampler and sketch here. Long
  *     headroom: |q| ≤ 2¹² · |v|, so products are ≤ ~2²⁶ and 10¹⁰ rows
  *     stay below 2⁶⁰.
  *   - The eigendecomposition runs on the DRIVER: the covariance is
  *     d×d (64² doubles = 32 KB) — driver-sized by construction, like
  *     the k-means centroid update. Cyclic Jacobi sweeps, deterministic
  *     order, canonical sign (largest-|entry| coordinate positive), so
  *     the basis is reproducible bit-for-bit.
  *   - Projection is r codegen'd [[graft.functions.functions.dot_product]]s
  *     against literal eigenvectors minus a precomputed scalar offset
  *     (the mean's projection) — a shuffle-free scan-speed map, the
  *     centroids-as-literals idiom from [[IvfIndex]].
  *
  * The trained basis ships as a committed fixture
  * (`fixtures/pca_basis.parquet`, [[graft.tools.TrainPca]]) so the
  * DuckDB oracle replays projection and projected-space ranking against
  * the exact committed relation — the classifier-weights pattern.
  */
object Pca {

  /** Quantization scale for integer-exact moments: 2¹² steps per unit. */
  val Scale: Double = 4096.0

  /** One eigenpair of the trained basis plus the mean's projection
    * (`offset = mean · evec`), so centering folds into a scalar
    * subtraction after the dot product. */
  final case class Component(component: Int, eigenvalue: Double,
      evec: Array[Double], offset: Double)

  final case class VecRow(v: Seq[Float])
  final case class MomentBuf(n: Long, m: Array[Long])

  /** Map-side-combinable moment accumulator: buffer = [Σq (dim longs),
    * upper-tri Σ qᵢqⱼ (dim(dim+1)/2 longs)], n carried alongside. */
  final class MomentAgg(dim: Int)
      extends Aggregator[VecRow, MomentBuf, MomentBuf] {
    private val tri = dim * (dim + 1) / 2

    override def zero: MomentBuf = MomentBuf(0L, new Array[Long](dim + tri))

    override def reduce(b: MomentBuf, a: VecRow): MomentBuf = {
      val v = a.v
      require(v.length == dim, s"expected dim=$dim vector, got ${v.length}")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = Math.round(v(i) * Scale); i += 1 }
      val m = b.m
      i = 0
      var t = dim
      while (i < dim) {
        m(i) += q(i)
        var j = i
        while (j < dim) { m(t) += q(i) * q(j); j += 1; t += 1 }
        i += 1
      }
      MomentBuf(b.n + 1, m)
    }

    override def merge(b1: MomentBuf, b2: MomentBuf): MomentBuf = {
      val m = b1.m
      var i = 0
      while (i < m.length) { m(i) += b2.m(i); i += 1 }
      MomentBuf(b1.n + b2.n, m)
    }

    override def finish(b: MomentBuf): MomentBuf = b
    override def bufferEncoder = Encoders.product[MomentBuf]
    override def outputEncoder = Encoders.product[MomentBuf]
  }

  /** Exact integer moments of the quantized vectors: one aggregation,
    * partitioning-invariant (PcaSpec pins it). */
  def moments(df: DataFrame, vecCol: String, dim: Int): MomentBuf = {
    val agg = udaf(new MomentAgg(dim), Encoders.product[VecRow])
    df.filter(col(vecCol).isNotNull)
      .agg(agg(col(vecCol)).as("m"))
      .collect().head.getStruct(0) match {
        case row => MomentBuf(row.getLong(0), row.getSeq[Long](1).toArray)
      }
  }

  /** Full eigenbasis of the covariance of the quantized data (in
    * ORIGINAL units — the 1/Scale² folds out), eigenvalues descending,
    * canonical signs. Also returns the mean vector for offsets. */
  def trainBasis(df: DataFrame, vecCol: String, dim: Int): Seq[Component] = {
    val mb = moments(df, vecCol, dim)
    require(mb.n > 1, s"need ≥2 vectors to train, got ${mb.n}")
    val n = mb.n.toDouble
    val mean = Array.tabulate(dim)(i => mb.m(i) / n / Scale)
    val cov = Array.ofDim[Double](dim, dim)
    var t = dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val pij = mb.m(t) / n / (Scale * Scale)
        val c = pij - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until dim).sortBy(j => (-evals(j), j))
    order.zipWithIndex.map { case (src, rank) =>
      val ev = canonicalSign(evecs(src))
      var off = 0.0
      var k = 0
      while (k < dim) { off += mean(k) * ev(k); k += 1 }
      Component(rank, evals(src), ev, off)
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic sweep order, no pivot search, converges quadratically
    * (d=64 needs ~8 sweeps). Returns (eigenvalues, eigenvectors as
    * ROWS of the returned matrix: evecs(j) is the j-th eigenvector). */
  private[ops] def jacobiEigen(src: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-30): (Array[Double], Array[Array[Double]]) = {
    val d = src.length
    val a = Array.tabulate(d, d)((i, j) => src(i)(j))
    // v(col)(row) accumulates rotations; transposed to rows at the end
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val tt = sgn / (theta * sgn + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(p)(k); val vkq = v(q)(k)
              v(p)(k) = c * vkp - s * vkq
              v(q)(k) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Largest-|entry| coordinate positive (first index on magnitude
    * ties) — pins the eigenvector's sign ambiguity. */
  private[ops] def canonicalSign(ev: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < ev.length) {
      if (math.abs(ev(i)) > math.abs(ev(best))) best = i
      i += 1
    }
    if (ev(best) < 0.0) ev.map(x => -x) else ev
  }

  /** Projection column: r centered coordinates, each one codegen'd
    * dot_product against a literal eigenvector minus the precomputed
    * mean offset — shuffle-free, whole-stage-codegen'd. */
  def projectCol(vec: Column, basis: Seq[Component], r: Int): Column = {
    require(r >= 1 && r <= basis.length, s"need 1 ≤ r ≤ ${basis.length}, got $r")
    val comps = basis.sortBy(_.component).take(r).map { c =>
      Similarity.dot(vec, array(c.evec.map(lit).toIndexedSeq: _*)) - lit(c.offset)
    }
    array(comps: _*)
  }

  /** Squared reconstruction error of the rank-`r` projection — the
    * off-manifold / outlier score a curation pipeline runs over its
    * embedding column (vectors the low-rank model cannot explain:
    * corrupt rows, modality mix-ups, OOD content). By orthonormal
    * completeness ‖v − mean‖² = Σ over ALL d components pⱼ², so the
    * residual is exactly the TAIL energy Σ_{j≥r} pⱼ² — computable from
    * the committed basis alone (no mean vector needed), shuffle-free,
    * and replayable verbatim by the oracle from the same fixture. */
  def residual2Col(vec: Column, basis: Seq[Component], r: Int): Column = {
    val sorted = basis.sortBy(_.component)
    require(r >= 0 && r < sorted.length, s"need 0 ≤ r < ${sorted.length}, got $r")
    sorted.drop(r).map { c =>
      val p = Similarity.dot(vec, array(c.evec.map(lit).toIndexedSeq: _*)) - lit(c.offset)
      p * p
    }.reduce(_ + _)
  }

  /** Exact top-k by squared L2 distance in the PROJECTED space — the
    * reduced-dimension ANN scan (r/dim of the flat scan's multiply-adds
    * per candidate; the PCA preprocessor's payoff). d² is expanded as
    * q·q + v·v − 2 q·v over the projected coordinates so the oracle
    * replays the identical association order. Two-phase salted top-k
    * like every ANN reduction here ([[Similarity.rankPerQuery]]). */
  def topKProjected(queries: DataFrame, corpus: DataFrame,
      basis: Seq[Component], r: Int, k: Int): DataFrame = {
    val pq = queries.select(col("qid"), projectCol(col("qvec"), basis, r).as("qp"))
    val pc = corpus.select(col("id"), projectCol(col("vec"), basis, r).as("vp"))
    val scored = pc.crossJoin(broadcast(pq))
      .withColumn("d2",
        Similarity.dot(col("qp"), col("qp")) + Similarity.dot(col("vp"), col("vp"))
          - lit(2.0) * Similarity.dot(col("qp"), col("vp")))
    Similarity.rankPerQuery(scored, -col("d2"), k)
      .select(col("qid"), col("id"), col("d2"), col("rank"))
  }

  /** Committed-basis loader (`fixtures/pca_basis.parquet`). */
  def loadBasis(spark: SparkSession, path: String): Seq[Component] =
    spark.read.parquet(path)
      .select("component", "eigenvalue", "evec", "offset")
      .collect()
      .map(row => Component(row.getInt(0), row.getDouble(1),
        row.getSeq[Double](2).toArray, row.getDouble(3)))
      .sortBy(_.component).toSeq
}
