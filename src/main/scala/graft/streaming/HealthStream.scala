package graft.streaming

import graft.ops.Profile
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The streaming twin of [[Profile.profileWithQuantiles]]
  * (`q_profile_quantiles`): an always-current table-health report over
  * an unbounded feed — ANALYZE-style column statistics AND per-column
  * rank-adaptive percentiles, continuously.
  *
  * Composition, not new machinery: both halves already have exact
  * streaming twins, and this pairs them over ONE source —
  *
  *   - the PROFILE half is [[Profile.profile]] with `approxNdv = true`,
  *     which IS a valid COMPLETE-mode streaming aggregate (count/min/
  *     max merge exactly, ndv is the mergeable HLL sketch —
  *     ProfileStreamSpec); its sink holds the current profile row per
  *     column after every micro-batch.
  *   - the QUANTILE half is the batch composition's own melt
  *     (numeric columns → `(col_name, id, v)` rows, nulls excluded —
  *     quantiles are over the non-null population, consistent with
  *     `n_nonnull`) fed into [[KmvStream.quantiles]] grouped by column
  *     name; per-column state is EXACTLY the batch bottom-k sketch, so
  *     stream ≡ batch is structural (KmvSketchSpec). Update-mode: the
  *     sink keeps the latest row per column.
  *
  * Two queries over one source is the honest shape: the halves need
  * different output modes (a COMPLETE aggregate vs an UPDATE stateful
  * sample) and Spark runs one sink per query — a consumer joins the
  * two sinks on `col_name`, which is what HealthStreamSpec does to pin
  * the assembled report ≡ [[Profile.profileWithQuantiles]] over
  * data-so-far at EVERY micro-batch. State is O(cols) profile rows +
  * O(numericCols × k) sketch pairs — independent of stream length. The
  * quantile half inherits [[KmvStream.DefaultInactivityTtl]] (7-day
  * group eviction): harmless here — groups are schema columns, live
  * ones re-arm on every batch — and it means a column DROPPED from the
  * melt eventually releases its sketch instead of holding it forever.
  */
object HealthStream {

  /** The two halves of the report over one source. Start the first
    * with `OutputMode.Complete` and the second with
    * `OutputMode.Update`; join the sinks on `col_name` for the
    * assembled report. */
  def tableHealth(events: DataFrame, cols: Seq[String],
      numericCols: Seq[String], idCol: String, seed: String, k: Int,
      qs: Seq[Double],
      inactivityTtl: Option[String] = Some(KmvStream.DefaultInactivityTtl))
      : (DataFrame, Dataset[KmvStream.KmvEstimate]) = {
    require(events.isStreaming,
      "HealthStream.tableHealth is a streaming operator; use Profile.profileWithQuantiles in batch")
    require(numericCols.forall(cols.contains),
      "every quantile column must also be profiled")
    val prof = Profile.profile(events, cols, approxNdv = true)
    // the same melt as the batch composition — column name becomes the
    // sketch group, the row id stays the sample key
    val melted = events.select(col(idCol).as("_pid"),
        explode(array(numericCols.map(c => struct(
          lit(c).as("col_name"),
          col(s"`$c`").cast("double").as("v"))): _*)).as("m"))
      .select(col("_pid"), col("m.col_name").as("col_name"), col("m.v").as("v"))
      .filter(col("v").isNotNull)
    val quant = KmvStream.quantiles(melted, "col_name", "_pid", "v",
      seed, k, qs, inactivityTtl)
    (prof, quant)
  }
}
