package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch retention/cohort analysis
  * (`q_retention`): which fraction of each signup-week cohort is still
  * active N weeks later, computed continuously over the event stream.
  *
  * Decomposition (the CurationStream discipline — stateful increment
  * stage, relational rollup as its own downstream query):
  *
  *   - [[increments]]: per-user `flatMapGroupsWithState` emitting ONE
  *     `(cohort_week, week_offset, user_id)` row the first time a user
  *     is seen in each week-offset — the cohort is pinned by the
  *     user's FIRST ARRIVAL (the only total order a stream has; batch
  *     uses min(week), so the two agree exactly on in-order arrival,
  *     which RetentionStreamSpec pins). State per user is two longs —
  *     the cohort week and a 64-bit seen-offset mask — so state is
  *     O(users) at ~16 bytes, NOT O(events), and each (user, offset)
  *     can emit at most once by construction.
  *   - [[rollup]]: `count(*)` per (cohort_week, week_offset) over the
  *     increments — a plain count, because the increment stage already
  *     guarantees distinctness (no countDistinct shuffle at scale).
  *     Run it over the increments SINK (`… → durable sink →
  *     readStream/batch → rollup`), not fused: Spark rightly rejects a
  *     stateful aggregation chained on `flatMapGroupsWithState` output
  *     (same composition rule as [[CurationStream.report]]).
  *
  * Horizon: offsets ≥ [[HorizonWeeks]] are dropped (a retention curve
  * beyond 64 weeks is a different analysis); out-of-order events from
  * BEFORE a user's pinned cohort are counted into the pinned cohort's
  * offset 0 — batch would re-assign the cohort, streaming cannot
  * rewrite history already emitted. Both bounds are the documented
  * price of the streaming form; the batch query remains the
  * retroactive truth.
  */
object RetentionStream {

  /** Offsets beyond this never emit (bitmask bound — 64 weeks ≈ 15
    * months of retention curve). */
  val HorizonWeeks: Int = 64

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class RetentionHit(cohort_week: Long, week_offset: Long,
    user_id: Long, ts: java.sql.Timestamp)
  /** cohort week + bitmask of offsets already emitted. */
  final case class UserSeen(cohortWeek: Long, seenMask: Long)

  /** Same week arithmetic as the batch query (epoch seconds / 604800,
    * floored). */
  def weekOf(epochMs: Long): Long =
    Math.floorDiv(Math.floorDiv(epochMs, 1000L), 604800L)

  /** The stateful stage: one output row per (user, week-offset) first
    * hit. Input needs `user_id` (castable to long) and a timestamp
    * `ts`. */
  def increments(events: DataFrame, delay: String = "1 hour"): Dataset[RetentionHit] = {
    require(events.isStreaming,
      "RetentionStream.increments is a streaming operator; use q_retention in batch")
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[UserEvent]
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSeen, RetentionHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[UserSeen]) =>
          // ascending week order inside the batch: the earliest event
          // pins the cohort even when one micro-batch spans weeks
          val evs = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(
            UserSeen(weekOf(evs.head.ts.getTime), 0L))
          val out = Seq.newBuilder[RetentionHit]
          evs.foreach { e =>
            val off = weekOf(e.ts.getTime) - st.cohortWeek
            // pre-cohort stragglers clamp to offset 0 (cohort already
            // emitted — see object doc); far-future offsets drop
            val offC = math.max(off, 0L)
            if (offC < HorizonWeeks && (st.seenMask & (1L << offC)) == 0L) {
              st = st.copy(seenMask = st.seenMask | (1L << offC))
              out += RetentionHit(st.cohortWeek, offC, user, e.ts)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Relational rollup over an increments relation (streaming sink or
    * batch frame): column-compatible with the `q_retention` oracle. */
  def rollup(hits: DataFrame): DataFrame =
    hits.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
}
