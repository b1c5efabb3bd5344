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
  */
object KmvStream {

  final case class KmvRow(g: String, h: Long, v: Double)
  final case class KmvState(hs: Seq[Long], vs: Seq[Double])
  final case class KmvEstimate(g: String, m_sample: Int, ests: Seq[Double])

  /** Per-group current quantiles. `events` needs a group column, a
    * unique id column, and a numeric value column. */
  def quantiles(events: DataFrame, groupCol: String, idCol: String,
      valueCol: String, seed: String, k: Int,
      qs: Seq[Double]): Dataset[KmvEstimate] = {
    require(events.isStreaming,
      "KmvStream.quantiles is a streaming operator; use Sketches.kmvQuantiles in batch")
    require(k >= 1 && qs.nonEmpty)
    import events.sparkSession.implicits._
    val h = Dedup.md5TokenHash60(concat(lit(seed), col(idCol).cast("string")))
    events.select(col(groupCol).cast("string").as("g"), h.as("h"),
        col(valueCol).cast("double").as("v"))
      .as[KmvRow]
      .groupByKey(_.g)
      .flatMapGroupsWithState[KmvState, KmvEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (g, rows, state: GroupState[KmvState]) =>
          val prev = state.getOption
            .map(st => st.hs.zip(st.vs).toVector).getOrElse(Vector.empty)
          // merge = union + re-cut, the batch sketch's own merge rule
          val merged = (prev ++ rows.map(r => (r.h, r.v)))
            .sortBy(identity).take(k)
          state.update(KmvState(merged.map(_._1), merged.map(_._2)))
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
