package graft.streaming

import graft.ops.Drift
import org.apache.spark.sql.{Column, DataFrame}

/** Streaming twin of [[Drift.driftByGroup]] (`q_drift`): an
  * always-current distribution-drift monitor over an unbounded feed —
  * per-slice PSI + binned KS vs the corpus-so-far reference after
  * every micro-batch.
  *
  * The twin is STRUCTURAL, the cheapest kind: [[Drift]] already splits
  * into the one data-sized pass ([[Drift.binnedCounts]] — exact
  * per-(group, bin) Long counts, a valid COMPLETE-mode streaming
  * aggregate because counts merge exactly) and a finishing step that is
  * a pure function of that bounded count relation
  * ([[Drift.fromCounts]]). The stream runs the counts half; a consumer
  * (or DriftStreamSpec, which pins it) applies the SAME finishing step
  * to the sink — so stream ≡ batch over data-so-far is by
  * construction, not by re-derivation.
  *
  * State is O(groups × nBins) count rows — independent of stream
  * length. The finishing step runs on the consumer's cadence, not
  * per-row; at 100 TB/day the stateful aggregate sees one long per
  * (slice, bin) and the drift report is a ≤ grid-sized batch job over
  * the sink.
  */
object DriftStream {

  /** The streaming half: exact (group, bin, c) counts, COMPLETE mode.
    * Finish with [[Drift.fromCounts]] over the sink. */
  def binnedCounts(events: DataFrame, groupCol: String, value: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(events.isStreaming,
      "DriftStream.binnedCounts is a streaming operator; use Drift.driftByGroup in batch")
    Drift.binnedCounts(events, groupCol, value, lo, hi, nBins)
  }
}
