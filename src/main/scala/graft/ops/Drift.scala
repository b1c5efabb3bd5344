package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Numeric-distribution drift between corpus slices — the data-quality
  * monitor a training pipeline runs on every ingest batch: has the
  * document-length (token-count, score, …) distribution of a source
  * moved away from the reference corpus? Two standard statistics over
  * one shared fixed-bin histogram:
  *
  *   - PSI (population stability index, the banking-world drift score):
  *     Σ over bins (p − q)·ln(p/q) with add-half smoothing so empty
  *     bins stay finite and the statistic is a pure function of the
  *     exact bin counts.
  *   - Binned Kolmogorov–Smirnov: max over bin edges |CDF_p − CDF_q| —
  *     the sup-distance of the binned ECDFs.
  *
  * Scale shape: ONE count aggregation per side over a clamped
  * fixed-width bin id (codegen'd arithmetic, map-side combinable —
  * the only data-sized pass), then all statistics live on the
  * bins×groups relation, which is BOUNDED (≤ nBins rows per group) —
  * the window prefix-sum for the CDF runs inside a ≤ nBins-row
  * partition, never over data. The complete group×bin grid is
  * materialized (cross join of two tiny relations) so zero-count bins
  * participate in both statistics.
  *
  * Everything is a pure function of exact Long bin counts, so the
  * DuckDB oracle replays PSI and KS bit-for-bit from the same counts
  * (`q_drift` — sums over ≤ nBins bins, 6-dp rounded).
  */
object Drift {

  /** Clamped fixed-width bin id: values below `lo` land in bin 0,
    * at/above `hi` in bin `nBins - 1`. */
  def binCol(value: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val width = (hi - lo) / nBins
    least(greatest(floor((value - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")
  }

  /** Per-group drift vs the whole-table reference distribution.
    *
    * @param df       rows to profile
    * @param groupCol slice column (e.g. source); each group is compared
    *                 against the FULL table (reference = all groups)
    * @param value    numeric expression to histogram
    * @return (group, n, psi, ks) — one row per group, exact counts,
    *         6-dp statistics, deterministic.
    */
  def driftByGroup(df: DataFrame, groupCol: String, value: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame =
    fromCounts(binnedCounts(df, groupCol, value, lo, hi, nBins), nBins)

  /** The only data-sized pass: exact per-(group, bin) counts. This is
    * also a valid COMPLETE-mode streaming aggregate (counts merge
    * exactly), which is how [[graft.streaming.DriftStream]] gets its
    * twin for free — see [[fromCounts]]. */
  def binnedCounts(df: DataFrame, groupCol: String, value: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame =
    df.select(col(groupCol).as("group"), binCol(value, lo, hi, nBins).as("bin"))
      .groupBy(col("group"), col("bin"))
      .agg(count(lit(1)).as("c"))

  /** Both statistics from the exact (group, bin, c) count relation —
    * a pure function of the counts, which is the twin contract: batch
    * and stream feed the SAME finishing step, so stream ≡ batch is
    * structural. The reference distribution is the per-bin sum over
    * all groups (= the full table). Bounded relation throughout
    * (≤ nBins rows per group). */
  def fromCounts(counts: DataFrame, nBins: Int): DataFrame = {
    val refCounts = counts.groupBy(col("bin")).agg(sum(col("c")).as("rc"))
    val groups = counts.select(col("group")).distinct()
    val bins = counts.sparkSession.range(nBins)
      .select(col("id").cast("int").as("bin"))
    // complete grid: every (group, bin), zero-filled — both statistics
    // need absent bins present (smoothed PSI mass, CDF steps)
    val grid = groups.crossJoin(broadcast(bins))
      .join(counts, Seq("group", "bin"), "left")
      .join(broadcast(refCounts), Seq("bin"), "left")
      .select(col("group"), col("bin"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val totals = grid.groupBy(col("group"))
      .agg(sum(col("c")).as("n"), sum(col("rc")).as("nr"))
    val w = Window.partitionBy(col("group")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(totals, Seq("group"))
      .withColumn("p", (col("c") + lit(0.5)) / (col("n") + lit(0.5 * nBins)))
      .withColumn("q", (col("rc") + lit(0.5)) / (col("nr") + lit(0.5 * nBins)))
      .withColumn("cum_p", sum(col("c")).over(w) / col("n"))
      .withColumn("cum_q", sum(col("rc")).over(w) / col("nr"))
      .groupBy(col("group"))
      .agg(max(col("n")).as("n"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6).as("psi"),
        round(max(abs(col("cum_p") - col("cum_q"))), 6).as("ks"))
      .orderBy(col("group"))
  }
}
