package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the bottom-k quantile sketch
  * ([[graft.ops.Sketches.kmvSketch]]): per group, maintain the k rows
  * with the smallest deterministic hash ever seen and emit the current
  * sample quantiles after every batch — an always-current rank-adaptive
  * percentile monitor over an unbounded feed.
  *
  * State per group is EXACTLY the batch sketch relation (≤ k (h, v)
  * pairs, kept sorted), so stream ≡ batch over data-so-far is
  * structural, not approximate: after any prefix of batches the
  * emitted quantiles equal [[graft.ops.Sketches.kmvQuantiles]] over
  * that prefix (KmvSketchSpec pins it). Update-mode semantics — each
  * batch re-emits the groups it touched; the sink keeps the latest row
  * per group. Bottom-k by hash is insertion-order-free, so
  * out-of-order arrival cannot change the state (a straggler either
  * displaces a larger hash or is ignored) — this twin has NO
  * out-of-order caveat, unlike the funnel/retention twins.
  *
  * Group eviction (`inactivityTtl`): per-group state is tiny (≤ k
  * pairs) but "groups ever seen" is unbounded — per-source monitoring
  * with source churn would accrete dead sketches forever. The
  * [[graft.streaming.AnomalyStream]] event-time rule does NOT transfer:
  * bottom-k state is permanently live by design (a straggler arriving
  * arbitrarily late CAN displace a buffered pair), so there is no
  * horizon past which dropping state is semantics-free. The policy
  * here is therefore an explicit PROCESSING-TIME inactivity TTL — a
  * group that has received no rows for the configured wall-clock
  * duration is dropped, bounding state at O(groups active in the TTL
  * horizon) × k pairs. Re-warm semantics are honest because the state
  * is a SAMPLE, not a counter: a group re-appearing after eviction
  * restarts from an empty sketch, and its emissions SAY so —
  * `m_sample` restarts near zero and grows again, exactly like a
  * brand-new group; nothing pretends to summarize the pre-eviction
  * population. The no-out-of-order property survives eviction
  * unchanged: between evictions arrival order still cannot affect the
  * state (the merge is a set bottom-k), and eviction itself is a
  * function of wall-clock inactivity, not of data order.
  *
  * Eviction is ON BY DEFAULT ([[DefaultInactivityTtl]], 7 days —
  * generous enough that any group under live monitoring never notices,
  * tight enough that a year of source churn cannot accrete a year of
  * dead sketches): an unbounded-state default is the wrong polarity
  * for an operator whose whole point is running forever. Pass
  * `inactivityTtl = None` to opt out EXPLICITLY — the right setting
  * when the group column has bounded cardinality (e.g.
  * [[HealthStream]], where groups are schema columns — it still
  * inherits the default, which is harmless for a bounded set). One
  * operational note: any TTL (including the default) runs the query
  * under `ProcessingTimeTimeout`, where the engine schedules no-data
  * micro-batches to sweep timers — pair the query with a processing-
  * time trigger (as the specs do) rather than the default
  * run-as-fast-as-possible trigger, and drive tests by sink-polling:
  * `processAllAvailable()` STARVES under timer sweeps (there is
  * always another batch due, so "all available processed" never
  * settles — measured, not theorized).
  */
object KmvStream {

  /** Default group-inactivity eviction horizon — see the eviction
    * contract above. */
  val DefaultInactivityTtl = "7 days"

  final case class KmvRow(g: String, h: Long, v: Double)
  final case class KmvState(hs: Seq[Long], vs: Seq[Double])
  final case class KmvEstimate(g: String, m_sample: Int, ests: Seq[Double])

  /** Per-group current quantiles. `events` needs a group column, a
    * unique id column, and a numeric value column. `inactivityTtl`
    * (e.g. `"30 minutes"`) evicts groups idle for that wall-clock
    * duration — default [[DefaultInactivityTtl]], `None` to opt out;
    * see the eviction contract above. */
  def quantiles(events: DataFrame, groupCol: String, idCol: String,
      valueCol: String, seed: String, k: Int,
      qs: Seq[Double],
      inactivityTtl: Option[String] = Some(DefaultInactivityTtl)): Dataset[KmvEstimate] = {
    require(events.isStreaming,
      "KmvStream.quantiles is a streaming operator; use Sketches.kmvQuantiles in batch")
    require(k >= 1 && qs.nonEmpty)
    import events.sparkSession.implicits._
    val h = Dedup.md5TokenHash60(concat(lit(seed), col(idCol).cast("string")))
    val timeoutConf =
      if (inactivityTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.select(col(groupCol).cast("string").as("g"), h.as("h"),
        col(valueCol).cast("double").as("v"))
      .as[KmvRow]
      .groupByKey(_.g)
      .flatMapGroupsWithState[KmvState, KmvEstimate](
        OutputMode.Update(), timeoutConf) {
        case (g, rows, state: GroupState[KmvState]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: drop the sketch. No tombstone emission —
            // the sink's last row for the group honestly reports the
            // sample as of its last activity; a re-warm overwrites it.
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
              .map(st => st.hs.zip(st.vs).toVector).getOrElse(Vector.empty)
            // merge = union + re-cut, the batch sketch's own merge rule
            val merged = (prev ++ rows.map(r => (r.h, r.v)))
              .sortBy(identity).take(k)
            state.update(KmvState(merged.map(_._1), merged.map(_._2)))
            // re-arm on every batch the group appears in — the timeout
            // measures INACTIVITY, so any arrival resets the clock
            inactivityTtl.foreach(state.setTimeoutDuration)
            val sample = merged.map(_._2).sorted
            val m = sample.length
            val ests = qs.map { q =>
              val rank = math.max(1, math.ceil(q * m).toInt)
              // HALF_UP: the rounding Spark's round() applies to doubles,
              // so the twin is bit-identical to the batch estimates
              BigDecimal.valueOf(sample(rank - 1))
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
            }
            Iterator.single(KmvEstimate(g, m, ests))
          }
      }
  }
}
