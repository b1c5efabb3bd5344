package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch funnel (`q_funnel`): per user, the
  * FIRST `firstType` event, then the FIRST `thenType` event that
  * follows it within the window — emitted as one conversion row per
  * user, continuously.
  *
  * This completes the event-analytics streaming trio next to
  * [[RetentionStream]] (retention) and
  * [[EventAggregates.sessionsByUser]] (sessionization). It is the
  * AGGREGATED complement of [[EventAggregates.followedBy]]: the
  * stream-stream join emits every qualifying (first, then) PAIR with
  * watermark-bounded join state; this operator carries exactly two
  * longs of state per user (first-step time + converted flag packed as
  * sign) and emits at most ONE row per user — the funnel metric
  * itself, no pair explosion, state O(users) independent of event
  * volume.
  *
  * Parity contract (FunnelStreamSpec): on in-order arrival the emitted
  * rows equal the batch formulation exactly — the first-seen
  * `firstType` IS min(t) and the first qualifying `thenType` IS the
  * min in the window. Out-of-order limits (documented, same shape as
  * retention): a `firstType` straggler EARLIER than the pinned first
  * step cannot rewrite an already-emitted conversion; batch remains
  * the retroactive truth.
  */
object FunnelStream {

  final case class FunnelEvent(user_id: Long, event_type: String,
    ts: java.sql.Timestamp)
  final case class Conversion(user_id: Long, t_click: Long, t_purchase: Long,
    secs_to_convert: Long)
  /** tFirst = epoch-sec of the pinned first step (−1 = none yet). */
  final case class FunnelState(tFirst: Long, converted: Boolean)

  /** Per-user conversions. Input columns: `user_id` (castable to
    * long), `event_type` (string), `ts` (timestamp). */
  def conversions(events: DataFrame, firstType: String = "click",
      thenType: String = "purchase", withinSec: Long = 86400L,
      delay: String = "1 hour"): Dataset[Conversion] = {
    require(events.isStreaming,
      "FunnelStream.conversions is a streaming operator; use q_funnel in batch")
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts"))
      .as[FunnelEvent]
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, converted = false))
          val out = Seq.newBuilder[Conversion]
          // ascending event time: the first-seen first-step is the min,
          // matching batch min() on in-order feeds
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = Math.floorDiv(e.ts.getTime, 1000L)
            if (e.event_type == firstType && st.tFirst < 0)
              st = st.copy(tFirst = t)
            else if (e.event_type == thenType && st.tFirst >= 0 &&
                !st.converted && t > st.tFirst && t <= st.tFirst + withinSec) {
              st = st.copy(converted = true)
              out += Conversion(user, st.tFirst, t, t - st.tFirst)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
