package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-evaluation metrics — purity and normalized mutual
  * information (NMI, the √(H(C)·H(L)) normalization of Strehl & Ghosh,
  * JMLR 2002) between a cluster assignment and a ground-truth label
  * column. The evaluation every corpus-clustering stage (domain
  * discovery, semantic dedup cells, mixture planning) reports before
  * its clusters are trusted downstream.
  *
  * Design for 100 TB: ONE groupBy over the data builds the
  * (cluster, label, n_cl) CONTINGENCY relation — map-side combined,
  * ≤ k·L rows cross the wire — and every metric is a finishing
  * aggregation over that bounded grid (the [[Drift]] histogram
  * discipline): marginals, entropies, mutual information and the
  * per-cluster majority vote never touch the data again.
  *
  * Cross-engine determinism: all counts exact longs; each MI/entropy
  * term is one ln of identical IEEE operands — the MI ratio's products
  * are taken in DOUBLE (n_cl·n and n_c·n_l overflow a long once n
  * passes ~3·10⁹ rows; the double form is exact below 2⁵³ and merely
  * rounds, never wraps, above it), with the DuckDB oracle multiplying
  * in the identical order; the ≤ k·L-term
  * sums round at the output (4 dp). Degenerate single-cluster or
  * single-label inputs have zero entropy on that side — NMI is defined
  * as 0 there (no information to normalize), purity still meaningful.
  */
object ClusterEval {

  /** The bounded contingency grid: (cluster, label, n_cl). */
  def contingency(df: DataFrame, clusterCol: String, labelCol: String): DataFrame =
    df.groupBy(col(clusterCol).as("cluster"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_cl"))

  /** One-row metrics report from a contingency relation:
    * (n, n_clusters, n_labels, purity, nmi), doubles rounded 4 dp. */
  def metricsFromContingency(cont: DataFrame): DataFrame = {
    val rowm = cont.groupBy("cluster").agg(sum("n_cl").as("n_c"),
      max("n_cl").as("n_c_max"))
    val colm = cont.groupBy("label").agg(sum("n_cl").as("n_l"))
    val tot = cont.agg(sum("n_cl").as("n"))
    val mi = cont.join(rowm.select("cluster", "n_c"), Seq("cluster"))
      .join(colm, Seq("label"))
      .crossJoin(tot)
      .agg(sum((col("n_cl").cast("double") / col("n")) *
        log((col("n_cl").cast("double") * col("n")) /
          (col("n_c").cast("double") * col("n_l")))).as("mi"))
    val hc = rowm.crossJoin(tot)
      .agg((-sum((col("n_c").cast("double") / col("n")) *
        log(col("n_c").cast("double") / col("n")))).as("hc"))
    val hl = colm.crossJoin(tot)
      .agg((-sum((col("n_l").cast("double") / col("n")) *
        log(col("n_l").cast("double") / col("n")))).as("hl"))
    val pur = rowm.crossJoin(tot)
      .agg((sum(col("n_c_max")).cast("double") / max(col("n"))).as("purity"))
    val counts = cont.agg(countDistinct(col("cluster")).as("n_clusters"),
      countDistinct(col("label")).as("n_labels"))
    tot.crossJoin(counts).crossJoin(pur).crossJoin(mi)
      .crossJoin(hc).crossJoin(hl)
      .select(col("n"), col("n_clusters"), col("n_labels"),
        round(col("purity"), 4).as("purity"),
        round(when(col("hc") > 0 && col("hl") > 0,
          col("mi") / sqrt(col("hc") * col("hl"))).otherwise(lit(0.0)), 4)
          .as("nmi"))
  }

  /** The composed report: contingency + metrics in one call. */
  def metrics(df: DataFrame, clusterCol: String, labelCol: String): DataFrame =
    metricsFromContingency(contingency(df, clusterCol, labelCol))
}
