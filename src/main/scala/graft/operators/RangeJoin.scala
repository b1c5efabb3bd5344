package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join with NO equi-key: pair every left row with the
  * right rows whose time lies inside a fixed window around the left
  * row's time — `r[rightT] ∈ [l[leftT] + low, l[leftT] + high)`.
  *
  * Spark has no native range-join strategy: a raw inequality-only join
  * plans as `BroadcastNestedLoopJoin` (or `CartesianProduct` when both
  * sides are large) — O(|L|·|R|) comparisons, the classic scale trap
  * for "events within Δt of each other" workloads. This operator
  * rewrites the band predicate into an equi-join on time *bins*:
  *
  *   - bin width = the band width `high - low`, so the window of any
  *     left row overlaps AT MOST TWO bins — each left row is expanded
  *     into exactly 2 candidate bins (a fixed 2× duplication,
  *     independent of data volume);
  *   - the right side keeps one row per row, keyed by its own bin;
  *   - the equi-join on bin is a plain shuffled/broadcast hash join
  *     (Catalyst picks; AQE can re-plan), and the exact band predicate
  *     runs as a residual filter on the (bounded) candidate pairs.
  *
  * Cost at 100 TB: one shuffle of each side on the bin key; candidate
  * volume per left row is the occupancy of 2 bins, i.e. data-rate ×
  * band — never corpus size. Hot bins (burst seconds) are ordinary
  * join skew: AQE's skew-join split handles moderate cases, and the
  * bin key composes with [[graft.ops.Skew.saltedJoin]] for pathological
  * ones (see Skew.scala's heuristic scaladoc).
  *
  * Both time columns must be integral (epoch seconds/millis — any unit,
  * as long as `low`/`high` are in the same unit). Column names of the
  * two inputs must be disjoint (standard join hygiene; the internal
  * `_bin` keys are dropped from the result).
  *
  * Reference tie-in: the reference has no relational surface (SURVEY §2
  * "absent" rows) — this is part of the mandated beyond-reference
  * extension set, the time-correlation primitive a training-data
  * pipeline uses for burst/incident attribution over event streams.
  */
object RangeJoin {

  /** Inner band join; see object doc. `low < high`, both in the time
    * columns' unit. Returns left columns ++ right columns. */
  def bandJoin(left: DataFrame, leftT: String, right: DataFrame,
      rightT: String, low: Long, high: Long): DataFrame = {
    require(low < high, s"empty band: [$low, $high)")
    val w = high - low
    // Floor-division bin (pmod keeps it correct for negative epochs).
    def bin(c: org.apache.spark.sql.Column) = ((c - pmod(c, lit(w))) / w).cast("long")
    // Left window [t+low, t+low+w) starts in bin b0 = bin(t+low) and can
    // spill only into b0+1 — two candidates, exactly.
    val l = left.withColumn("_bins",
      array(bin(col(leftT) + low), bin(col(leftT) + low) + 1))
      .withColumn("_bin", explode(col("_bins"))).drop("_bins")
    val r = right.withColumn("_bin", bin(col(rightT)))
    l.join(r, Seq("_bin"))
      .filter(col(rightT) >= col(leftT) + low && col(rightT) < col(leftT) + high)
      .drop("_bin")
  }

  /** The O(|L|·|R|) formulation (nested-loop by construction) — kept as
    * the parity baseline for specs; never use at scale. */
  private[graft] def bandJoinNaive(left: DataFrame, leftT: String,
      right: DataFrame, rightT: String, low: Long, high: Long): DataFrame =
    left.join(right,
      col(rightT) >= col(leftT) + low && col(rightT) < col(leftT) + high)

  /** [[bandJoin]] with salted shuffle for pathological hot bins (a
    * burst second can put millions of rows into ONE time bin on both
    * sides — then the bin equi-join itself becomes the straggler).
    * Composes [[graft.ops.Skew.saltedJoin]] over the bin key: the
    * probe side's hot-bin rows spread across `salt` sub-partitions
    * (salted by `saltBy`, a unique-ish probe column), the left side's
    * (already 2×-exploded) candidates replicate `salt`× — so use when
    * `left` is the small side (incidents vs. a firehose), and prefer
    * plain [[bandJoin]] + AQE skew-split otherwise (see Skew.scala's
    * heuristic). Output is row-identical to [[bandJoin]]. */
  def bandJoinSalted(left: DataFrame, leftT: String, right: DataFrame,
      rightT: String, low: Long, high: Long, saltBy: String,
      salt: Int = 16): DataFrame = {
    require(low < high, s"empty band: [$low, $high)")
    val w = high - low
    def bin(c: org.apache.spark.sql.Column) = ((c - pmod(c, lit(w))) / w).cast("long")
    val l = left.withColumn("_bins",
      array(bin(col(leftT) + low), bin(col(leftT) + low) + 1))
      .withColumn("_bin", explode(col("_bins"))).drop("_bins")
    val r = right.withColumn("_bin", bin(col(rightT)))
    graft.ops.Skew.saltedJoin(r, l, Seq("_bin"), col(saltBy), salt)
      .filter(col(rightT) >= col(leftT) + low && col(rightT) < col(leftT) + high)
      .drop("_bin")
  }

  /** Interval OVERLAP join: pairs of half-open intervals
    * `[lStart, lEnd) × [rStart, rEnd)` with a non-empty intersection
    * (`lStart < rEnd && rStart < lEnd`) — the interval×interval member
    * of the family ([[bandJoin]] is point×window).
    *
    * Binned the same way, with two twists:
    *   - each interval explodes to EVERY bin it covers
    *     (`sequence(bin(start), bin(end-1))`): the fan-out per row is
    *     ~interval-length/`binWidth`, so pick `binWidth` at or above
    *     the typical interval length for ≤ 2 bins per row — long
    *     outliers are still CORRECT, just fatter;
    *   - two overlapping intervals can share several bins, so a naive
    *     bin-equi-join emits duplicates. Instead of a distinct shuffle,
    *     each pair is emitted ONLY in the bin containing
    *     `greatest(lStart, rStart)` — that point lies inside the
    *     intersection, so exactly one covered bin wins, and the
    *     multiplicity never exists to be removed (same
    *     strip-the-redundancy-before-the-shuffle lesson as
    *     Dedup.minhashLshPairs, applied one stage earlier).
    *
    * Empty intervals (end <= start) never match. Cost at 100 TB: one
    * shuffle per side on the bin key, candidates bounded by per-bin
    * occupancy × bins-per-interval.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(binWidth))) / binWidth).cast("long")
    val l = left.filter(col(lEnd) > col(lStart))
      .withColumn("_bin", explode(sequence(bin(col(lStart)), bin(col(lEnd) - 1))))
    val r = right.filter(col(rEnd) > col(rStart))
      .withColumn("_bin", explode(sequence(bin(col(rStart)), bin(col(rEnd) - 1))))
    l.join(r, Seq("_bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("_bin") === bin(greatest(col(lStart), col(rStart))))
      .drop("_bin")
  }

  private[graft] def overlapJoinNaive(left: DataFrame, lStart: String,
      lEnd: String, right: DataFrame, rStart: String, rEnd: String): DataFrame =
    left.filter(col(lEnd) > col(lStart)).join(right.filter(col(rEnd) > col(rStart)),
      col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
}
