package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog: distinct counting whose ENTIRE
  * computation — hash, register assignment, rank, bias-corrected
  * estimate, small-range correction — is replayable in plain SQL, so
  * the `q_hll_distinct` oracle hash-gates the sketch end-to-end.
  * Spark's built-in `approx_count_distinct` (HLL++) is the production
  * default and is bound-checked in DistinctSpec, but its sketch bytes
  * are engine-private; this portable twin is for pipelines that need
  * a distinct-count artifact a DIFFERENT engine can recompute, verify,
  * or merge (cross-engine data contracts, incremental corpus stats).
  *
  * Scale shape — the reason sketched distinct exists at all: exact
  * `count(distinct user)` shuffles every distinct value; the sketch
  * shuffles at most `groups × m` register rows no matter the
  * cardinality (map-side partial `max` makes the exchange input
  * `partitions × groups × m` worst-case), and registers MERGE by
  * element-wise max, so per-split sketches combine without re-reading
  * data (SketchesSpec pins split-merge ≡ whole-corpus).
  *
  * Determinism: the hash is the md5-60 ([[Dedup.md5TokenHash60]]) of
  * `seed ‖ value`, register index = low `p` bits, rank = leading-zero
  * count of the remaining `60−p` bits + 1 (computed via `bin()` string
  * length — integer-exact in both engines, no floating `log2`). The
  * register→estimate step keeps the harmonic sum in EXACT integer
  * arithmetic (`Σ_j 2^(Q−M_j)` with `Q = 61−p`, bounded by `m·2^Q ≤
  * 2^61` < Long.MaxValue — no overflow, no FP summation order), so the
  * only floats are the final `α·m²·2^Q / S` division and the `ln` of
  * linear counting — reproduced by DuckDB from the same doubles and
  * absorbed by the round-2 convention.
  */
object Sketches {

  /** α_m bias constant (Flajolet et al. 2007): tabulated for small m,
    * asymptotic formula otherwise. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-group HLL registers: `(groupCols…, j, mj)` — one row per
    * OCCUPIED register (absent registers mean rank 0 and are accounted
    * for arithmetically in [[hllEstimate]], so the relation stays
    * sparse for low-cardinality groups). One aggregation exchange
    * keyed by (group, j); this relation IS the mergeable sketch —
    * union register relations from disjoint splits and re-run
    * [[hllEstimate]] (its `max(mj)` re-aggregation is the merge). */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column,
      seed: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val h = Dedup.md5TokenHash60(concat(lit(seed), value.cast("string")))
    // rank = (60−p) − bitlen(w) + 1 for the top bits w; bitlen via the
    // bin() string minus leading zeros — ltrim('0') maps w=0 to "" so
    // the all-zeros rank (61−p) falls out with no special case.
    df.select((groupCols.map(col) :+
        h.bitwiseAND(lit(m.toLong - 1)).as("j") :+
        (lit(61 - p) - length(ltrim(bin(shiftright(h, p)), "0"))).as("rank")): _*)
      .groupBy((groupCols.map(col) :+ col("j")): _*)
      .agg(max(col("rank")).as("mj"))
  }

  /** Registers → per-group estimate `(groupCols…, approx)`, rounded to
    * 2 dp (the cross-engine double convention). Raw estimate
    * `α·m²·2^Q / S` with `S = Σ_j 2^(Q−M_j)` over ALL m registers
    * (absent ⇒ M=0 ⇒ 2^Q), as an exact Long sum; linear counting
    * `m·ln(m/zeros)` replaces it below `2.5m` while empty registers
    * remain. Idempotent over duplicate register relations (the inner
    * `max(mj)` both merges splits and dedups). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val q = 61 - p
    val alphaM2 = hllAlpha(m) * m.toDouble * m.toDouble
    registers
      .groupBy((groupCols.map(col) :+ col("j")): _*)
      .agg(max(col("mj")).as("mj"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $q - mj)")).as("s_occ"),
        count(lit(1)).as("occupied"))
      .withColumn("zeros", lit(m.toLong) - col("occupied"))
      .withColumn("e_raw",
        lit(alphaM2) * lit(1L << q).cast("double") /
          (col("s_occ") + col("zeros") * lit(1L << q)).cast("double"))
      .withColumn("approx", round(
        when(col("e_raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("e_raw")), 2))
      .select((groupCols.map(col) :+ col("approx")): _*)
  }

  /** Full pipeline: per-group approximate distinct count of `value`.
    * Relative error ≈ 1.04/√m (p=9 ⇒ ~4.6%). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
      seed: String, p: Int = 9): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, value, seed, p), groupCols, p)

  // ------------------------------------------------------------------
  // Count-min sketch: the frequency member of the sketch family
  // (HLL answers "how many distinct", CMS answers "how often is X").
  // ------------------------------------------------------------------

  /** The d seeded bucket hashes of a value — shared by build and
    * lookup so the two sides can never drift. */
  private def cmsHashes(value: Column, seed: String, d: Int, w: Int): Column =
    array((0 until d).map(i =>
      struct(lit(i).as("i"),
        pmod(Dedup.md5TokenHash60(concat(lit(s"$seed$i|"), value.cast("string"))),
          lit(w.toLong)).as("bucket"))): _*)

  /** Build a count-min sketch of `value` frequencies: `(i, bucket, c)`
    * with `c = Σ` occurrences hashing to that cell — `d` independent
    * rows of `w` counters. The sketch is `d·w` cells REGARDLESS of
    * vocabulary or corpus size (one aggregation exchange keyed by
    * (i, bucket), map-side combined), and sketches of disjoint splits
    * merge by cell-wise `c` addition — re-run [[cmsLookup]] after a
    * union-and-sum. Point estimates only ever OVER-count (collisions
    * add, never subtract): error ≤ e·N/w with prob 1−e^(−d).
    * All-integer arithmetic — the `q_cms_topk` oracle replays it with
    * zero rounding concerns. */
  def cmsSketch(df: DataFrame, value: Column, seed: String,
      d: Int = 4, w: Int = 1024, weight: Column = lit(1L)): DataFrame = {
    require(d >= 1 && w >= 2, s"need d ≥ 1 rows of w ≥ 2 counters, got d=$d w=$w")
    // `weight` lets a pre-aggregated (value, count) relation build the
    // same sketch as raw occurrences (SketchesSpec pins the identity) —
    // when a query computes exact counts anyway, the sketch derives
    // from the vocab-sized relation instead of a second corpus pass.
    df.select(explode(cmsHashes(value, seed, d, w)).as("x"), weight.as("wt"))
      .groupBy(col("x.i").as("i"), col("x.bucket").as("bucket"))
      .agg(sum(col("wt")).cast("long").as("c"))
  }

  /** Estimate each candidate's frequency from the sketch:
    * `est(v) = min_i c[i][h_i(v)]` (0 when every cell is absent —
    * possible only for values never sketched). The sketch side is tiny
    * by construction, so it broadcasts; candidates stream past it. */
  def cmsLookup(sketch: DataFrame, candidates: DataFrame, value: Column,
      seed: String, d: Int = 4, w: Int = 1024): DataFrame =
    candidates.select(value.as("v"),
        explode(cmsHashes(value, seed, d, w)).as("x"))
      .join(broadcast(sketch),
        col("x.i") === col("i") && col("x.bucket") === col("bucket"), "left")
      .groupBy(col("v"))
      .agg(coalesce(min(col("c")), lit(0L)).as("est"))

  // ------------------------------------------------------------------
  // Fixed-bin quantile sketch: the QUANTILE member of the sketch family
  // (HLL: "how many distinct", CMS: "how often", this: "what value at
  // rank q"). Spark's approx_percentile (t-digest) is the production
  // default (bound-checked in SketchesSpec), but its sketch bytes are
  // engine-private; this portable twin keeps the family's discipline:
  // integer-exact counts, DuckDB-replayable end-to-end, merge ≡ whole.
  // ------------------------------------------------------------------

  /** Per-group equi-width bin histogram of `value`: `(groupCols…, bin,
    * cnt)` with `bin = floor((value − lo)/width)` — one row per
    * OCCUPIED bin. This relation IS the mergeable sketch: sketches of
    * disjoint splits merge by per-bin `cnt` addition (union then
    * re-sum — SketchesSpec pins split-merge ≡ whole), and its size is
    * bounded by the bin count of the value RANGE, never the corpus.
    * One aggregation exchange keyed by (group, bin), map-side combined:
    * the exchange input is `partitions × groups × bins` worst-case no
    * matter how many rows are sketched — the same scale shape as
    * [[hllRegisters]]/[[cmsSketch]].
    *
    * All counts are exact integers; the only float is the
    * `floor((v−lo)/width)` bin assignment, the identical IEEE double
    * expression DuckDB evaluates — no rounding convention needed. */
  def histogramSketch(df: DataFrame, groupCols: Seq[String], value: Column,
      lo: Double, width: Double): DataFrame = {
    require(width > 0, s"bin width must be positive, got $width")
    df.select((groupCols.map(col) :+
        floor((value - lit(lo)) / lit(width)).cast("long").as("bin")): _*)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Self-ranging [[histogramSketch]] (round-10 directive #4): for a
    * column whose range the caller does NOT know (doc lengths, model
    * scores at 100 TB), derive `(lo, width)` from a min/max pre-pass
    * and split the observed range into `bins` equi-width bins.
    * Returns `(sketch, lo, width)` so [[histogramQuantiles]] can
    * replay the same edges.
    *
    * Cost of the pre-pass: ONE metadata-cheap aggregation — min/max
    * over a plain parquet column is answered from row-group footer
    * statistics when aggregate pushdown applies (the repo's own
    * footer-aggregate gate in PlanQualitySpec proves that plan shape),
    * and is a plain map-side-combined agg otherwise; either way it is
    * a (lo, hi) PAIR on the driver, never data. Determinism across
    * engines: min/max of doubles are exact, `(hi−lo)/bins` and the
    * `floor((v−lo)/width)` bin assignment are single IEEE expressions
    * both engines evaluate identically — the `q_quantile_sketch2`
    * oracle recomputes the range in SQL and hash-matches end-to-end.
    *
    * A constant column (hi == lo) degenerates to one bin of `width`
    * 1.0 — every quantile answers the constant (SketchesSpec pins
    * it). Known trade-off vs a rank-adaptive sketch (KLL/t-digest):
    * equi-width bins give rank error bounded by the heaviest bin's
    * mass, not a uniform ε — the right default for the
    * scores-and-lengths telemetry this family serves, with
    * `approx_percentile` as the engine-private production alternative
    * (bound-checked in SketchesSpec). */
  def histogramSketchAuto(df: DataFrame, groupCols: Seq[String],
      value: Column, bins: Int = 128): (DataFrame, Double, Double) = {
    require(bins >= 1, s"need at least one bin, got $bins")
    // BARE min/max (no cast wrapping the column): aggregate pushdown
    // only fires on plain column extrema, so the cast-to-double happens
    // on the two collected values, not inside the aggregate — the
    // pre-pass stays footer-answerable for every numeric physical type
    // (SketchesSpec pins PushedAggregation on this exact shape).
    val r = df.agg(min(value).as("lo"), max(value).as("hi")).collect()(0)
    require(!r.isNullAt(0), "cannot range an empty (or all-null) column")
    def num(i: Int): Double = r.get(i) match {
      case d: java.math.BigDecimal => d.doubleValue
      case n: Number => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"histogramSketchAuto needs a numeric column, got $other")
    }
    val lo = num(0)
    val hi = num(1)
    val width = if (hi > lo) (hi - lo) / bins else 1.0
    (histogramSketch(df, groupCols, value, lo, width), lo, width)
  }

  // ------------------------------------------------------------------
  // Rank-adaptive quantile sketch: a bottom-k-by-hash uniform row
  // sample (KMV applied to row IDS, not values). The histogram family
  // above has error bounded by bin WIDTH — on a heavy-tailed column
  // most mass lands in few bins and a p99 estimate can be off by half
  // the distribution (KmvSketchSpec demonstrates the failure). This
  // sketch's error is bounded in RANK, uniformly over the whole CDF
  // (DKW: ~1.36/√k at 95% for all quantiles at once — k=1024 ⇒ ~4%),
  // independent of the value distribution — the heavy-tail-safe member
  // of the family.
  //
  // Why a hash sample and not KLL/t-digest: KLL's compactions are
  // randomized and ORDER-dependent — merging split sketches and
  // sketching the whole stream give structurally different summaries,
  // so the family's "merge ≡ whole, replayed bit-exactly by DuckDB"
  // discipline is unachievable. Bottom-k by a deterministic hash is
  // order-free and exactly mergeable (bottom-k of a union IS the
  // bottom-k of the parts' bottom-k's), costs O(k) memory, and the
  // whole computation — hash, ranking, sample-quantile pick — is plain
  // SQL both engines evaluate identically. The trade is ε ~ O(1/√k)
  // instead of KLL's O(1/k) at equal memory — bought back at 100 TB by
  // k being a few thousand longs per group. approx_percentile
  // (t-digest) stays the engine-private production alternative,
  // bound-checked in SketchesSpec.
  // ------------------------------------------------------------------

  /** Per-group bottom-k sample: `(groupCols…, h, v)` — the k rows with
    * the smallest `md5₆₀(seed ‖ id)` per group (ties by value:
    * deterministic). This relation IS the mergeable sketch: sketches
    * of disjoint splits merge by union + re-rank ([[kmvQuantiles]]
    * re-ranks on entry, so merge is just `union`).
    *
    * `id` must be a UNIQUE key (hashing the value would sample
    * DISTINCT values and bias every rank); uniform-by-hash over ids is
    * a uniform row sample, so sample quantiles estimate population
    * quantiles with rank error O(1/√k) regardless of the distribution.
    *
    * Scale shape: the ranking window shuffles (group, h, v) triplets —
    * narrow, but all rows. At 100 TB pass `prefilterRate` (any upper
    * bound r with r·n_group ≥ k, e.g. 10k/n_lower): rows with
    * `h ≥ r·2⁶⁰` can never be in the bottom-k, so the filter drops
    * them AT THE SCAN and the exchange carries ~r·n rows per group.
    * The cut is exact, not approximate — membership is unchanged as
    * long as ≥ k rows per group survive (the k-th smallest hash is
    * below any threshold that admits k rows); KmvSketchSpec pins
    * filtered ≡ unfiltered. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], id: Column,
      value: Column, seed: String, k: Int,
      prefilterRate: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"need k ≥ 1, got $k")
    require(groupCols.nonEmpty,
      "kmvSketch needs ≥1 group column (a global sketch is the lit-group case)")
    val h = Dedup.md5TokenHash60(concat(lit(seed), id.cast("string")))
    // A null id yields a null hash (no rank position) and a null value
    // carries no sample information — drop both HERE so the window and
    // aggregate forms agree on null-bearing inputs (the typed
    // aggregator's Pair encoder is non-nullable; without this filter
    // the window form would rank nulls first while the aggregate threw).
    val base = df.select((groupCols.map(col) :+
      h.as("h") :+ value.cast("double").as("v")): _*)
      .filter(col("h").isNotNull && col("v").isNotNull)
    val pre = prefilterRate match {
      case Some(r) =>
        require(r > 0.0 && r <= 1.0, s"prefilterRate must be in (0,1], got $r")
        base.filter(col("h") < lit((r * (1L << 60).toDouble).toLong))
      case None => base
    }
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("v"))
    pre.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** [[kmvSketch]] as a map-side-combinable AGGREGATE
    * ([[graft.functions.BottomKAgg]]) — same rows, different exchange
    * economics: the window form shuffles every (group, h, v) triplet
    * before it can rank, while the aggregate cuts to k inside each
    * input partition (partial ObjectHashAggregate), so the exchange
    * carries ≤ partitions × groups buffers of ≤ k pairs — the
    * [[hllRegisters]]/[[cmsSketch]] scale shape with NO prefilter
    * contract needed. This is the default 100 TB form; the window form
    * remains the simple/oracle-transparent one (the `q_quantile_kmv`
    * oracle replays the cut as a window — identical rows either way,
    * pinned in KmvSketchSpec). */
  def kmvSketchAgg(df: DataFrame, groupCols: Seq[String], id: Column,
      value: Column, seed: String, k: Int): DataFrame = {
    require(k >= 1, s"need k ≥ 1, got $k")
    require(groupCols.nonEmpty,
      "kmvSketchAgg needs ≥1 group column (a global sketch is the lit-group case)")
    val h = Dedup.md5TokenHash60(concat(lit(seed), id.cast("string")))
    val bk = udaf(new graft.functions.BottomKAgg(k),
      org.apache.spark.sql.Encoders.product[graft.functions.BottomKAgg.Pair])
    // identical null discipline to kmvSketch: drop null hash/value rows
    // BEFORE the aggregate (whose Pair encoder is non-nullable) so the
    // two formulations agree on null-bearing inputs
    df.select((groupCols.map(col) :+
        h.as("h") :+ value.cast("double").as("v")): _*)
      .filter(col("h").isNotNull && col("v").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(bk(col("h"), col("v")).as("r"))
      .select((groupCols.map(col) :+ explode(col("r.pairs")).as("p")): _*)
      .select((groupCols.map(col) :+
        col("p._1").as("h") :+ col("p._2").as("v")): _*)
  }

  /** Sketch → per-group quantile estimates `(groupCols…, <name>…,
    * m_sample)`: re-rank to the bottom-k (the merge step — idempotent
    * on an already-cut sketch, the cut on a union of disjoint splits),
    * then for each `(name, q)` answer the sample value at rank
    * `⌈q·m⌉` by ascending value (the [[histogramQuantiles]] rank
    * convention). A group with fewer than k rows holds its WHOLE
    * population — quantiles are exact there. Both windows run over ≤ k
    * rows per group — the bounded kind. */
  def kmvQuantiles(sketch: DataFrame, groupCols: Seq[String], k: Int,
      qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty, "need at least one quantile")
    val keyCols = groupCols.map(col)
    val wH = Window.partitionBy(keyCols: _*).orderBy(col("h"), col("v"))
    val wV = Window.partitionBy(keyCols: _*).orderBy(col("v"), col("h"))
    val wAll = Window.partitionBy(keyCols: _*)
    val ranked = sketch
      .withColumn("_rn", row_number().over(wH)).filter(col("_rn") <= k)
      .withColumn("vr", row_number().over(wV))
      .withColumn("m", count(lit(1)).over(wAll))
    val ests = qs.map { case (name, q) =>
      round(min(when(col("vr") >= ceil(lit(q) * col("m")), col("v"))), 2).as(name)
    }
    ranked.groupBy(keyCols: _*)
      .agg(ests.head, (ests.tail :+ max(col("m")).as("m_sample")): _*)
  }

  /** Sketch → per-group quantile estimates `(groupCols…, <name>…, n)`.
    * For each requested `(name, q)`: target rank `⌈q·n⌉`, answer = the
    * LOWER EDGE of the first bin (ascending) whose cumulative count
    * reaches it. The exact q-quantile lies inside that bin by
    * construction, so the estimate is within one `width` of truth and
    * its rank error is bounded by the bin's mass (both pinned in
    * SketchesSpec). Idempotent over merged sketches (the inner re-sum
    * collapses duplicate bin rows — the merge IS a re-aggregation).
    *
    * The cumulative window runs over the SKETCH (≤ bins rows per
    * group), not the data — a per-group window here is the bounded
    * kind, nothing like the per-query full-corpus windows
    * AnnReductionSpec bans. */
  def histogramQuantiles(sketch: DataFrame, groupCols: Seq[String],
      lo: Double, width: Double, qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty, "need at least one quantile")
    val keyCols = groupCols.map(col)
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val withCum = sketch
      .groupBy((keyCols :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val ests = qs.map { case (name, q) =>
      round(min(when(col("cum") >= ceil(lit(q) * col("n")),
        lit(lo) + col("bin") * lit(width))), 2).as(name)
    }
    withCum.groupBy(keyCols: _*)
      .agg(ests.head, (ests.tail :+ max(col("n")).as("n")): _*)
  }
}
