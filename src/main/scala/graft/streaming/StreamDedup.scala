package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
            Iterator.empty // replay within the TTL window → suppress
          } else {
            val buffered = rows.toSeq
            val maxT = buffered.iterator.map(eventTimeMs).max
            state.update(Seen(maxT))
            state.setTimeoutTimestamp(maxT + ttlMs)
            buffered.iterator.take(1) // first event for this key wins
          }
      }
  }
}
