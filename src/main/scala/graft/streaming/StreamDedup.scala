package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming deduplication: emit each key's first event,
  * suppress replays while the key's state lives — the streaming guard
  * that turns an at-least-once source into exactly-once visible events
  * (the stateful complement to the idempotent batch merge in
  * [[graft.operators.SyncOps.mergeBatch]]).
  *
  * Built on `flatMapGroupsWithState` with EVENT-TIME timeout: per-key
  * state is one timestamp and is dropped when the watermark passes
  * (event time + TTL), so state size is O(keys inside the watermark
  * horizon), not O(stream). Processing-time timeout is deliberately NOT
  * used — it makes the engine schedule timeout-only micro-batches
  * forever, which melts test harnesses (`processAllAvailable` never
  * quiesces) and burns cluster cycles when idle.
  */
object StreamDedup {

  final case class Seen(maxEventTimeMs: Long)

  /** Deduplicate a keyed streaming dataset.
    *
    * @param eventTimeCol timestamp column used for the watermark
    * @param delay        watermark delay (how late data may arrive)
    * @param ttlMs        how long after a key's event time replays are
    *                     suppressed (state drops when the watermark
    *                     passes eventTime + ttl)
    */
  def dedupByKey[T](ds: Dataset[T], key: T => String,
      eventTimeMs: T => Long, eventTimeCol: String, delay: String,
      ttlMs: Long): Dataset[T] = {
    // batch frames have no watermark to expire state against — batch
    // dedup is dropDuplicates/dropExactDups, not a stateful stream op
    require(ds.isStreaming, "dedupByKey is a streaming operator; use dropDuplicates in batch")
    implicit val enc: Encoder[T] = ds.encoder
    implicit val seenEnc: Encoder[Seen] =
      org.apache.spark.sql.Encoders.product[Seen]
    implicit val strEnc: Encoder[String] = org.apache.spark.sql.Encoders.STRING
    val withWm = ds.withWatermark(eventTimeCol, delay)
    withWm.groupByKey(key)
      .flatMapGroupsWithState[Seen, T](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows: Iterator[T], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // Replay within the TTL window → suppress. MUST re-arm the
            // timeout: GroupState voids any set timeout every time the
            // function is invoked for the key, so a replay would
            // otherwise silently cancel expiry and suppress the key
            // forever. Re-arm from the STORED first-event time (TTL is
            // anchored to the first event, not extended by replays),
            // clamped above the watermark — setTimeoutTimestamp rejects
            // timestamps the watermark already passed; in that case the
            // key expires at the next timeout sweep.
            val expiry = state.get.maxEventTimeMs + ttlMs
            state.setTimeoutTimestamp(math.max(expiry, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          } else {
            val buffered = rows.toSeq
            val maxT = buffered.iterator.map(eventTimeMs).max
            state.update(Seen(maxT))
            state.setTimeoutTimestamp(maxT + ttlMs)
            buffered.iterator.take(1) // first event for this key wins
          }
      }
  }

  /** [[dedupByKey]] on Spark 4.x's arbitrary-state v2
    * (`transformWithState` + [[StatefulProcessor]]) — the supported
    * long-term API for custom streaming state. Semantics are identical
    * to the `flatMapGroupsWithState` variant (StreamDedupSpec runs both
    * on the same replay/TTL script and asserts equal outputs); the
    * differences are operational:
    *   - state lives in RocksDB (the v2 operator requires
    *     `spark.sql.streaming.stateStore.providerClass` =
    *     RocksDBStateStoreProvider), so state size is bounded by disk
    *     + block cache, not executor heap — the right trade at 100 TB
    *     where the in-watermark key set can exceed memory;
    *   - expiry is an explicit event-time timer (`registerTimer`)
    *     instead of `setTimeoutTimestamp`, and state types are declared
    *     (`ValueState[Long]`) so the engine can encode them columnar.
    */
  def dedupByKeyTws[T](ds: Dataset[T], key: T => String,
      eventTimeMs: T => Long, eventTimeCol: String, delay: String,
      ttlMs: Long): Dataset[T] = {
    require(ds.isStreaming, "dedupByKeyTws is a streaming operator; use dropDuplicates in batch")
    implicit val enc: Encoder[T] = ds.encoder
    implicit val strEnc: Encoder[String] = org.apache.spark.sql.Encoders.STRING
    ds.withWatermark(eventTimeCol, delay)
      .groupByKey(key)
      .transformWithState(new DedupProcessor[T](eventTimeMs, ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-key first-event filter: one `ValueState[Long]` holding the
    * first-seen event time; an event-time timer at `eventTime + ttl`
    * clears it so the key can be emitted again after the TTL horizon —
    * exactly the `flatMapGroupsWithState` logic restated in the v2 API.
    * TTL here is watermark-driven (the timer), NOT [[TTLConfig]]'s
    * processing-time TTL — event-time semantics must not depend on
    * wall-clock batch timing.
    */
  private final class DedupProcessor[T](eventTimeMs: T => Long, ttlMs: Long)
      extends StatefulProcessor[String, T, T] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[T],
        timerValues: TimerValues): Iterator[T] =
      if (seen.exists()) {
        Iterator.empty // replay within the TTL window → suppress
      } else {
        val buffered = rows.toSeq
        val maxT = buffered.iterator.map(eventTimeMs).max
        seen.update(maxT)
        getHandle.registerTimer(maxT + ttlMs)
        buffered.iterator.take(1) // first event for this key wins
      }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[T] = {
      seen.clear()
      Iterator.empty
    }
  }
}
