package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput profiler for the streaming sessionization twin
  * ([[graft.streaming.SessionStream]]): replays an sf directory's
  * events table through a file-source streaming query (bounded
  * micro-batches via maxFilesPerTrigger over a re-staged multi-file
  * copy) into the noop sink with `Trigger.AvailableNow`, and reports
  * wall seconds + input rows + emitted (watermark-closed) sessions.
  * The point is the sf0.1 → sf1 RATIO: `session_window` state is
  * O(open sessions) and each micro-batch's work is one merge pass over
  * its keys, so 10× events should cost ~10× wall (linear), not worse.
  *
  * Usage: ProfileSessionStream <sfDir> [files=8]
  */
object ProfileSessionStream {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileSessionStream <sfDir> [nFiles]")
    val sfDir = args(0)
    val nFiles = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage the events as nFiles parquet files so AvailableNow replays
    // them as a genuine multi-batch stream, not one giant batch
    val staged = graft.Staging.dirFor("session-profile-in")
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"),
        timestamp_seconds(Tables.tsSeconds(col("ts"))).as("t"))
    val nIn = batch.count()
    batch.repartition(nFiles).write.mode("overwrite").parquet(staged)

    val stream = spark.readStream
      .schema("user_id BIGINT, t TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
    val sessions = graft.streaming.SessionStream.sessions(
      stream, "user_id", "t", gapSeconds = 1800, watermarkDelay = "1 hour")
    val t0 = System.nanoTime()
    val q = sessions.writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .format("noop")
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val emitted = q.lastProgress // rows emitted live in per-batch sink metrics
    println(f"""{"sf":"$sfDir","input_rows":$nIn,"wall_sec":$wall%.2f,"batches":${Option(emitted).map(_.batchId + 1).getOrElse(-1L)}}""")
    spark.stop()
  }
}
