package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of one key belong to the
  * same session while the gap between them is ≤ `gapSeconds`; a larger
  * gap starts a new session.
  *
  * Batch implementation: one shuffle on the key, ordered window, session
  * id = running count of gap-breaks (classic lag+cumsum). The streaming
  * twin (unbounded sources) uses `session_window` / state timeouts — see
  * graft.streaming.
  */
object Sessionize {

  /** Adds `session_id` (per-key ordinal) to an event frame whose time
    * column holds epoch seconds (long). */
  def byGap(events: DataFrame, keyCol: String, timeSecCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeSecCol))
    val isBreak = when(
      col(timeSecCol) - lag(col(timeSecCol), 1).over(w) > gapSeconds, 1L)
      .otherwise(0L)
    events
      .withColumn("_brk", isBreak)
      .withColumn("session_id", sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_brk")
  }

  /** Per-session rollup: bounds, duration, event count. */
  def sessionStats(events: DataFrame, keyCol: String, timeSecCol: String,
      gapSeconds: Long): DataFrame =
    byGap(events, keyCol, timeSecCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(timeSecCol)).as("session_start"),
        max(col(timeSecCol)).as("session_end"),
        (max(col(timeSecCol)) - min(col(timeSecCol))).as("duration_sec"),
        count(lit(1)).as("n_events"))
}
