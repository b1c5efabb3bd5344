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

  /** Stream-stream event-time join: for each user, pair every `firstType`
    * event with the `thenType` events that follow it within `within`
    * (funnel/causality queries — "purchase followed by error inside an
    * hour").
    *
    * State-bounding is the whole design: BOTH sides carry a watermark and
    * the join condition bounds `then.ts` to [first.ts, first.ts+within],
    * so Spark can expire buffered rows once the watermark passes the
    * range — state is O(events inside the window), never unbounded.
    * Works identically on batch frames (same plan, no watermark).
    */
  def followedBy(first: DataFrame, then_ : DataFrame, within: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermarkDelay) else df
    val a = wm(first).select(col("user_id").as("a_user"),
      col("ts").as("a_ts"), col("event_id").as("first_event_id"))
    val b = wm(then_).select(col("user_id").as("b_user"),
      col("ts").as("b_ts"), col("event_id").as("then_event_id"))
    a.join(b,
        col("a_user") === col("b_user") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .select(col("a_user").as("user_id"), col("first_event_id"),
        col("then_event_id"), col("a_ts").as("first_ts"), col("b_ts").as("then_ts"))
  }
}
