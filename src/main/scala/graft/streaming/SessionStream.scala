package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Sessionize.sessionStats]]
  * (`q_sessionize`): gap-based sessions over an unbounded event feed,
  * built on Structured Streaming's NATIVE `session_window` — the one
  * streaming operator in this library where Spark's built-in dynamic-
  * gap session state is exactly the right machinery, so no custom
  * `flatMapGroupsWithState` processor exists to drift from it. State
  * is Spark's merged-window store: O(open sessions), closed and
  * emitted (Append mode) once the watermark passes a session's end.
  *
  * Gap-boundary parity, pinned exactly: the batch rule keeps two
  * events in one session when `next − prev ≤ gap` (a break needs a
  * STRICTLY larger gap), and `session_window` merges per-event windows
  * `[t, t+g)` INCLUSIVELY — windows that merely TOUCH (`next = prev +
  * g`) still merge (SessionStreamSpec pins this with an exact-gap step
  * inside a session AND an exact-gap+1 break) — so the two rules
  * coincide at `g = gap` with no correction. The emitted bounds
  * satisfy `window.start = min t` and `window.end = max t + gap`; this
  * operator subtracts the `gap` back out and its output schema IS the
  * batch rollup's: (key, session_start, session_end, duration_sec,
  * n_events), epoch seconds. (The batch `session_id` ordinal — "this
  * user's 3rd session ever" — is inherently retrospective and has no
  * streaming equivalent; sessions are identified by their start.)
  */
object SessionStream {

  /** Gap-closed sessions over a streaming event frame.
    *
    * @param events streaming frame with `tsCol` as a TIMESTAMP column
    * @param watermarkDelay how much event-time disorder to admit; a
    *        session is emitted once the watermark clears its end
    * Run with `OutputMode.Append`.
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, watermarkDelay: String): DataFrame = {
    require(events.isStreaming,
      "SessionStream.sessions is a streaming operator; use Sessionize.sessionStats in batch")
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol),
        session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_timestamp(col("session_window.start")).as("session_start"),
        (unix_timestamp(col("session_window.end")) - gapSeconds)
          .as("session_end"),
        (unix_timestamp(col("session_window.end")) - gapSeconds -
          unix_timestamp(col("session_window.start"))).as("duration_sec"),
        col("n_events"))
  }
}
