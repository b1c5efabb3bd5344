package graft.streaming

import graft.SparkSpec
import graft.ops.Profile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of the column profiler: [[Profile.profile]] with
  * `approxNdv = true` IS a valid complete-mode streaming aggregate
  * (count/min/max merge exactly; ndv is the mergeable HLL sketch —
  * exact multi-distinct is not a streaming aggregate), so the
  * stream's current answer over data-so-far must equal the batch
  * profile of the same rows.
  */
class ProfileStreamSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq(
    (1L, Option("en"), 120L), (2L, Option("de"), 80L),
    (3L, Option.empty[String], 77L), (4L, Option("en"), 80L),
    (5L, Option("fr"), 205L), (6L, Option("en"), 80L))

  private def snap(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[String]("col_name"), r.getAs[Long]("n_nonnull"),
      r.getAs[Long]("ndv"), r.getAs[String]("min_val"),
      r.getAs[String]("max_val"))).toSet

  test("complete-mode stream profile equals the batch profile of data-so-far") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cols = Seq("id", "lang", "n_chars")
    val mem = MemoryStream[(Long, Option[String], Long)]
    val prof = Profile.profile(
      mem.toDF().toDF("id", "lang", "n_chars"), cols, approxNdv = true)
    val q = prof.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("prof_stream").start()
    try {
      data.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk: _*); q.processAllAvailable()
        val soFar = data.take((i + 1) * 2)
        val batch = Profile.profile(
          soFar.toDF("id", "lang", "n_chars"), cols, approxNdv = true)
        assert(snap(spark.table("prof_stream").collect().toSeq) ==
          snap(batch.collect().toSeq), s"after batch $i")
      }
    } finally q.stop()
  }
}
