package graft.streaming

import graft.SparkSpec
import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The drift monitor's streaming/batch twin contract: the stream runs
  * only the count aggregation; [[Drift.fromCounts]] over the sink must
  * equal [[Drift.driftByGroup]] over data-so-far at EVERY micro-batch
  * — exactly, because both are the same pure function of the same
  * exact Long counts.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  // two sources, the second drifting upward batch by batch
  private val data: Seq[(String, Double)] =
    (0 until 30).map(i => ("web", (i % 10) * 10.0)) ++
    (0 until 30).map(i => ("crawl", 40.0 + (i % 12) * 5.0))

  private def snap(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[String]("group"), r.getAs[Long]("n"),
      r.getAs[Double]("psi"), r.getAs[Double]("ks"))).toSet

  test("stream counts + batch finishing equal the batch monitor at every micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val counts = DriftStream.binnedCounts(
      mem.toDF().toDF("src", "v"), "src", col("v"), 0.0, 100.0, 10)
    val q = counts.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("drift_counts").start()
    try {
      val shuffled = new scala.util.Random(7L).shuffle(data)
      shuffled.grouped(20).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk: _*); q.processAllAvailable()
        val soFar = shuffled.take((i + 1) * 20)
        // snapshot the sink into a stable relation before finishing —
        // fromCounts references its input three times, and the memory
        // sink's View cannot be self-joined (conflicting references)
        val sink = spark.table("drift_counts")
        val frozen = spark.createDataFrame(sink.collectAsList(), sink.schema)
        val streamed = Drift.fromCounts(frozen, 10)
        val batch = Drift.driftByGroup(soFar.toDF("src", "v"), "src",
          col("v"), 0.0, 100.0, 10)
        assert(snap(streamed.collect().toSeq) == snap(batch.collect().toSeq),
          s"after micro-batch $i")
      }
    } finally q.stop()
  }
}
