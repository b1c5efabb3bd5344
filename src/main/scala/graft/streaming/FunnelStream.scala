package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch funnel ([[graft.operators.Funnel]]):
  * per user, the first completion of an ordered k-step chain of event
  * types, each step within its own time window of the previous step —
  * emitted as ONE completion row per user, continuously.
  *
  * This completes the event-analytics streaming trio next to
  * [[RetentionStream]] (retention) and
  * [[EventAggregates.sessionsByUser]] (sessionization). It is the
  * AGGREGATED complement of [[EventAggregates.followedBy]]: the
  * stream-stream join emits every qualifying PAIR with
  * watermark-bounded join state; this operator carries O(k) longs of
  * state per user (the pinned times of the completed prefix + a done
  * flag) and emits at most ONE row per user — the funnel metric
  * itself, no pair explosion, state independent of event volume.
  *
  * Parity contract (FunnelStreamSpec, pinned against BOTH the 2-step
  * `q_funnel` and the 3-step `q_funnel_steps` chain): on in-order
  * arrival the emitted rows equal [[graft.operators.Funnel
  * .firstCompletion]] exactly — the batch fold is greedy (step 0 pins
  * min(t) of its type; step i pins the min qualifying event after step
  * i−1), and a greedy in-order stream pin IS that min at every step.
  * Strict `t > prev` inter-step inequality matches batch, so a
  * repeated type (a → b → a) needs a genuinely later event here too.
  * Out-of-order limits (documented, same shape as retention): a step-0
  * straggler EARLIER than the pinned first step cannot rewrite an
  * already-advanced chain; batch remains the retroactive truth.
  *
  * State lifetime is deliberately UNBOUNDED (`NoTimeout`), unlike
  * [[AnomalyStream]]'s semantics-free TTL: the batch contract is ONE
  * completion per user EVER, anchored at the user's global first
  * step-0 event. Dropping a `done` state would let a later event
  * cluster emit a second completion; dropping a stuck chain would let
  * the stream re-anchor at a later step-0 event and complete where
  * batch (anchored at the earlier one) never does. Both divergences
  * are exactly what the parity contract forbids, so reclamation here
  * must be an application-level decision (e.g. re-keying users per
  * campaign epoch), not an operator default. State is O(k longs)/user
  * — users-ever-seen × ~40 bytes, not event volume.
  */
object FunnelStream {

  final case class FunnelEvent(user_id: Long, event_type: String,
    ts: java.sql.Timestamp)
  final case class Conversion(user_id: Long, t_click: Long, t_purchase: Long,
    secs_to_convert: Long)
  /** One row per user on chain completion; `ts_steps(i)` = epoch-sec
    * of the pinned step-i event (length k, ascending). */
  final case class Completion(user_id: Long, ts_steps: Seq[Long])
  /** `times` = pinned epoch-secs of the completed step prefix (next
    * expected step index = times.length); `done` latches after the
    * final step so replays/extra events never emit a second row. */
  final case class ChainState(times: Seq[Long], done: Boolean)

  /** Generic k-step per-user first completions. Input columns:
    * `user_id` (castable to long), `event_type` (string), `ts`
    * (timestamp).
    *
    * @param steps   event types in funnel order (k ≥ 2; types may repeat)
    * @param windows max seconds from step i−1 to step i (length k−1)
    */
  def completions(events: DataFrame, steps: Seq[String],
      windows: Seq[Long], delay: String = "1 hour"): Dataset[Completion] = {
    require(events.isStreaming,
      "FunnelStream.completions is a streaming operator; use Funnel.firstCompletion in batch")
    require(steps.length >= 2, "a funnel needs at least two steps")
    require(windows.length == steps.length - 1,
      s"need one window per transition: ${steps.length - 1}, got ${windows.length}")
    require(windows.forall(_ > 0), "windows must be positive")
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("ts"))
      .as[FunnelEvent]
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ChainState, Completion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[ChainState]) =>
          var st = state.getOption.getOrElse(ChainState(Nil, done = false))
          val out = Seq.newBuilder[Completion]
          // ascending event time: the first in-order qualifying event at
          // each stage is that stage's min, matching the batch fold
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (!st.done) {
              val t = Math.floorDiv(e.ts.getTime, 1000L)
              val i = st.times.length // next expected step
              val qualifies = e.event_type == steps(i) && (i == 0 ||
                (t > st.times.last && t <= st.times.last + windows(i - 1)))
              if (qualifies) {
                st = st.copy(times = st.times :+ t)
                if (st.times.length == steps.length) {
                  st = st.copy(done = true)
                  out += Completion(user, st.times)
                }
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The 2-step funnel in its original named shape (`q_funnel`'s
    * click→purchase columns) — a thin view over [[completions]]. */
  def conversions(events: DataFrame, firstType: String = "click",
      thenType: String = "purchase", withinSec: Long = 86400L,
      delay: String = "1 hour"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    completions(events, Seq(firstType, thenType), Seq(withinSec), delay)
      .map(c => Conversion(c.user_id, c.ts_steps.head, c.ts_steps(1),
        c.ts_steps(1) - c.ts_steps.head))
  }
}
