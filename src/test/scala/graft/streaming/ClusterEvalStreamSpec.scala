package graft.streaming

import graft.SparkSpec
import graft.ops.ClusterEval
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The cluster-quality monitor's streaming/batch twin contract: the
  * stream runs only the contingency aggregation;
  * [[ClusterEval.metricsFromContingency]] over the sink must equal
  * [[ClusterEval.metrics]] over data-so-far at EVERY micro-batch. */
class ClusterEvalStreamSpec extends SparkSpec {
  import spark.implicits._

  // 3 clusters drifting from label-aligned to mixed as batches arrive
  private val data: Seq[(Int, Int)] =
    (0 until 30).map(i => (i % 3, i % 3)) ++
    (0 until 30).map(i => (i % 3, (i + (i % 2)) % 3))

  private def snap(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("n"), r.getAs[Long]("n_clusters"),
      r.getAs[Long]("n_labels"), r.getAs[Double]("purity"),
      r.getAs[Double]("nmi"))).toSet

  test("stream contingency + batch finishing equal the batch metrics at every micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, Int)]
    val cont = ClusterEvalStream.contingency(
      mem.toDF().toDF("cluster", "label"), "cluster", "label")
    val q = cont.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("ce_counts").start()
    try {
      data.grouped(15).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk: _*); q.processAllAvailable()
        val soFar = data.take((i + 1) * 15)
        val sink = spark.table("ce_counts")
        val frozen = spark.createDataFrame(sink.collectAsList(), sink.schema)
        val streamed = ClusterEval.metricsFromContingency(frozen)
        val batch = ClusterEval.metrics(
          soFar.toDF("cluster", "label"), "cluster", "label")
        assert(snap(streamed.collect().toSeq) == snap(batch.collect().toSeq),
          s"after micro-batch $i")
      }
    } finally q.stop()
  }

  test("batch input is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      ClusterEvalStream.contingency(
        Seq((1, 1)).toDF("cluster", "label"), "cluster", "label")
    }
    assert(e.getMessage.contains("streaming operator"))
  }
}
