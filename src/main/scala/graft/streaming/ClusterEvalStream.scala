package graft.streaming

import graft.ops.ClusterEval
import org.apache.spark.sql.DataFrame

/** Streaming twin of [[ClusterEval.metrics]] (`q_cluster_eval`): an
  * always-current cluster-quality monitor over an unbounded labeled
  * feed — purity + NMI vs the data-so-far after every micro-batch.
  *
  * STRUCTURAL twin, the [[DriftStream]] kind: [[ClusterEval]] already
  * splits into the one data-sized pass ([[ClusterEval.contingency]] —
  * exact (cluster, label, n_cl) Long counts, a valid COMPLETE-mode
  * streaming aggregate because counts merge exactly) and a finishing
  * step that is a pure function of that bounded grid
  * ([[ClusterEval.metricsFromContingency]]). The stream runs the
  * contingency half; the consumer applies the SAME finishing function
  * to the sink — stream ≡ batch over data-so-far by construction.
  *
  * State is O(clusters × labels) count rows, independent of stream
  * length — the production use: a domain-clustered ingest feed whose
  * cluster-vs-source agreement is watched for assignment rot without
  * ever re-scanning history.
  */
object ClusterEvalStream {

  /** The streaming half: exact (cluster, label, n_cl) counts, COMPLETE
    * mode. Finish with [[ClusterEval.metricsFromContingency]] over the
    * sink. */
  def contingency(docs: DataFrame, clusterCol: String, labelCol: String): DataFrame = {
    require(docs.isStreaming,
      "ClusterEvalStream.contingency is a streaming operator; use ClusterEval.metrics in batch")
    ClusterEval.contingency(docs, clusterCol, labelCol)
  }
}
