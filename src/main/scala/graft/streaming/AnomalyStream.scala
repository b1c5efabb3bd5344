package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the rolling z-score anomaly query (`q_anomaly`):
  * flag each event whose value deviates more than 2 trailing standard
  * deviations from the user's trailing-24h frame, continuously.
  *
  * Same integer-exact test as batch — with cents x and frame sums
  * S=Σx, Q=Σx²: `(x·n − S)² > 4·(n·Q − S²)` — so a flag raised here is
  * bit-identical to the batch flag, not approximately equal.
  *
  * State per user is the trailing-24h (t, cents) buffer — bounded by
  * one user-day of events (the SAME bound the batch RANGE frame has;
  * a mis-keyed firehose user is a skew problem in both forms).
  * Idle-user state is reclaimed by an EVENT-TIME timeout (the
  * [[StreamDedup]] pattern): state drops when the watermark passes the
  * user's last event + the 24h window. This TTL is SEMANTICS-FREE, not
  * approximate — any future event the watermark still admits carries
  * t ≥ watermark > lastEvent + 24h, so the trailing frame would have
  * evicted every buffered entry anyway; dropping the state early can
  * never change a flag. State size is therefore O(users ACTIVE in the
  * watermark horizon + 24h), not O(users ever seen). A user
  * re-appearing after the horizon re-warms from an empty frame: their
  * first events score nothing until the frame refills to MinFrame —
  * identical to a brand-new user, and identical to what the batch
  * RANGE frame computes for a >24h gap (no false flag either way;
  * AnomalyStreamSpec pins both halves).
  *
  * Parity contract (AnomalyStreamSpec): equal to the batch formulation
  * on in-order arrival WITH same-timestamp events delivered in one
  * micro-batch — the batch RANGE frame includes same-t peers
  * bidirectionally, so the stream processes each distinct timestamp as
  * a group: all events at time t enter the frame BEFORE any of them is
  * scored (the tie-safety move that makes RANGE, not ROWS, the right
  * frame in both engines).
  */
object AnomalyStream {

  final case class VEvent(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, cents: Long)
  final case class Flagged(user_id: Long, event_id: Long, t_sec: Long,
    cents: Long, n: Long, s: Long, q: Long, is_anomaly: Boolean)
  final case class FrameState(ts: Seq[Long], cents: Seq[Long])

  val WindowSec = 86400L
  val MinFrame = 8

  /** Per-event flags over a streaming frame. Input columns: `user_id`
    * (castable to long), `event_id` (long), `ts` (timestamp), `value`
    * (double — becomes cents exactly like batch). */
  def flags(events: DataFrame, delay: String = "1 hour"): Dataset[Flagged] = {
    require(events.isStreaming,
      "AnomalyStream.flags is a streaming operator; use q_anomaly in batch")
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[VEvent]
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FrameState, Flagged](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[FrameState]) =>
          if (state.hasTimedOut) {
            // Watermark passed lastEvent + 24h: no admissible future
            // event can see any buffered entry — drop the user.
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
              .map(st => st.ts.zip(st.cents).toVector).getOrElse(Vector.empty)
            // scoring kernel shared with the v2 processor: distinct
            // timestamps ascending, all same-t events enter the frame
            // before any is scored (the RANGE-frame tie rule)
            val (out, buf) = scoreBatch(user, rows.toSeq, prev)
            state.update(FrameState(buf.map(_._1), buf.map(_._2)))
            // Re-arm on EVERY invocation (GroupState voids the pending
            // timeout each call — the StreamDedup lesson). Expiry is the
            // NEWEST buffered second + the window — max, not buf.last:
            // an admissible out-of-order straggler is appended at the
            // end of the frame, so last can be older than the newest
            // entry and arming from it would drop state an admissible
            // event could still see. Clamped above the current watermark
            // (setTimeoutTimestamp rejects passed timestamps; the clamp
            // expires the key next sweep).
            val lastMs = buf.iterator.map(_._1).max * 1000L
            state.setTimeoutTimestamp(math.max(lastMs + WindowSec * 1000L,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** [[flags]] on Spark 4.x's arbitrary-state v2 (`transformWithState`
    * + [[StatefulProcessor]]) — the [[StreamDedup.dedupByKeyTws]]
    * pattern applied to the HEAVIEST-state twin: per-user trailing-24h
    * buffers live in RocksDB (bounded by disk + block cache, not
    * executor heap), which is the right trade at 100 TB where the
    * in-horizon user set times a day of events can exceed memory.
    * Scoring logic is shared verbatim with the v1 operator
    * ([[scoreBatch]]), so the two APIs cannot drift — AnomalyStreamSpec
    * runs both on one script and asserts equal output. Idle-user
    * reclamation is the same semantics-free event-time rule, as an
    * explicit timer: prior timers are deleted and one is re-registered
    * at lastEvent + 24h each time the user appears (a stale timer
    * would otherwise fire and drop a re-warmed frame early — harmless
    * for flags below MinFrame, but the invariant "state exists ⇔ an
    * admissible event could still see it" is worth keeping exact). */
  def flagsTws(events: DataFrame, delay: String = "1 hour"): Dataset[Flagged] = {
    require(events.isStreaming,
      "AnomalyStream.flagsTws is a streaming operator; use q_anomaly in batch")
    import events.sparkSession.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .as[VEvent]
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new FrameProcessor(),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The shared scoring kernel: fold one batch of a user's events into
    * the trailing frame, emitting flags — used identically by the
    * fMGWS closure and the v2 processor. Returns (flags, new frame). */
  private[streaming] def scoreBatch(user: Long, events: Seq[VEvent],
      frame: Vector[(Long, Long)]): (Seq[Flagged], Vector[(Long, Long)]) = {
    var buf = frame
    val out = Seq.newBuilder[Flagged]
    val byT = events.groupBy(e => Math.floorDiv(e.ts.getTime, 1000L))
    byT.keys.toSeq.sorted.foreach { t =>
      val peers = byT(t).sortBy(_.event_id)
      buf = buf.dropWhile(_._1 < t - (WindowSec - 1)) ++
        peers.map(e => t -> e.cents)
      val n = buf.length.toLong
      if (n >= MinFrame) {
        val s = buf.iterator.map(_._2).sum
        val q = buf.iterator.map(c => c._2 * c._2).sum
        peers.foreach { e =>
          val dev = e.cents * n - s
          out += Flagged(user, e.event_id, t, e.cents, n, s, q,
            dev * dev > 4L * (n * q - s * s))
        }
      }
    }
    (out.result(), buf)
  }

  private final class FrameProcessor
      extends StatefulProcessor[Long, VEvent, Flagged] {
    @transient private var frame: ValueState[FrameState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      frame = getHandle.getValueState[FrameState]("frame",
        org.apache.spark.sql.Encoders.product[FrameState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[VEvent],
        timerValues: TimerValues): Iterator[Flagged] = {
      val prev = Option(frame.get())
        .map(st => st.ts.zip(st.cents).toVector).getOrElse(Vector.empty)
      val (flags, buf) = scoreBatch(key, rows.toSeq, prev)
      frame.update(FrameState(buf.map(_._1), buf.map(_._2)))
      // exactly one live timer per user: NEWEST buffered event + window
      // (max, not buf.last — an out-of-order straggler sits at the end)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(
        buf.iterator.map(_._1).max * 1000L + WindowSec * 1000L)
      flags.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Flagged] = {
      frame.clear()
      Iterator.empty
    }
  }
}
