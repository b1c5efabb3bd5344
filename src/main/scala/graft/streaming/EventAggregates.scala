package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming aggregations over the change/event stream:
  * tumbling windows and gap-based session windows, with watermarks
  * bounding state. These extend the engine beyond reference parity (the
  * reference has no event-time semantics — SURVEY.md §2.4) to the
  * streaming shapes a 100 TB pipeline actually needs.
  *
  * State-size design: the watermark bounds how long a window's partial
  * aggregate lives; keys are (window, type) / (user, session), so state
  * is O(active windows), not O(events).
  */
object EventAggregates {

  /** Tumbling event-time window counts/sums per event type.
    * `events` needs an event-time `ts` timestamp column. Works
    * identically on batch and streaming frames (same plan). */
  def hourlyByType(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    wm.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Gap-based session windows per user (streaming twin of
    * [[graft.operators.Sessionize]]). */
  def sessionsByUser(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    wm.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
  }
}
