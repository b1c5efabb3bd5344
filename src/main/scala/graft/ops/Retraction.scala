package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted delete propagation through partitioned corpus/index layouts
  * — the reference's delete-propagation contract (SURVEY.md §2.3 D9:
  * a deletion observed at the source must disappear from every
  * destination) applied to a training corpus's derived stores, where
  * it is the right-to-be-forgotten path: a delete list must leave the
  * accepted corpus, the near-dup band index, and the ANN index with no
  * trace of the ids, without rewriting the world.
  *
  * Scale shape: the layouts are partitioned (`batch=` epochs from
  * [[graft.streaming.IngestGate]], nested `cell=` for the ANN index),
  * so retraction is (1) one column-pruned scan joining the broadcast
  * delete list to find WHICH partitions contain victims, then (2) a
  * read-filter-overwrite of ONLY those partitions. Partitions with no
  * victims keep their exact files byte-for-byte — at 100 TB with a
  * KB-sized delete list, the rewrite touches a handful of directories
  * (RetractionSpec pins untouched-partition file identity).
  *
  * Idempotent by construction: re-retracting the same ids finds no
  * victim partitions and writes nothing. Readers of an un-rewritten
  * partition see the old files until its overwrite commits — the same
  * eventually-consistent read story as the gate's epoch appends.
  */
object Retraction {

  /** Remove rows whose `idCol` appears in `ids` from the partitioned
    * parquet layout at `dir`. `partCol` is the top-level partition key
    * (`batch` for gate sinks); `nestedPartCols` are partition levels
    * INSIDE each top-level directory that must be preserved on rewrite
    * (`Seq("cell")` for the ANN index). Returns the number of
    * partitions rewritten. */
  def retract(spark: SparkSession, dir: String, idCol: String,
      ids: Seq[Long], partCol: String = "batch",
      nestedPartCols: Seq[String] = Nil): Int = {
    require(ids.nonEmpty, "empty delete list")
    val idsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_victim", org.apache.spark.sql.types.LongType))))
    // (1) which partitions hold victims — column-pruned scan, broadcast
    // semi-join on the (small by contract) delete list
    val affected = spark.read.parquet(dir)
      .select(col(idCol), col(partCol))
      .join(broadcast(idsDf), col(idCol) === col("_victim"), "left_semi")
      .select(partCol).distinct()
      .collect().map(_.get(0))
    // (2) rewrite only those partitions, preserving nested layout.
    // Write-to-temp-then-swap: Spark (correctly) refuses to overwrite a
    // path it is reading, and the swap keeps the window where the
    // partition is absent to a directory rename. (Crash between delete
    // and rename loses the partition but never corrupts it — the
    // manifest-pointer commit in streaming/SyncStream is the pattern to
    // compose with when atomicity matters.)
    val hadoopConf = spark.sessionState.newHadoopConf()
    affected.foreach { p =>
      val part = new org.apache.hadoop.fs.Path(s"$dir/$partCol=$p")
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.retract-$partCol-$p")
      val survivors = spark.read.parquet(part.toString)
        .join(broadcast(idsDf), col(idCol) === col("_victim"), "left_anti")
      val writer = survivors.write.mode("overwrite")
      (if (nestedPartCols.nonEmpty) writer.partitionBy(nestedPartCols: _*)
       else writer).parquet(tmp.toString)
      val fs = part.getFileSystem(hadoopConf)
      fs.delete(part, true)
      fs.rename(tmp, part)
    }
    affected.length
  }

  /** Propagate one delete list through every sink the ingest gate
    * maintains: accepted corpus, band index, and (when present) the
    * ANN index with its nested cell layout. */
  def retractAll(spark: SparkSession, ids: Seq[Long], idCol: String,
      acceptedDir: String, indexDir: String,
      annDir: Option[String] = None): Unit = {
    retract(spark, acceptedDir, idCol, ids)
    retract(spark, indexDir, "id", ids)
    annDir.foreach(d => retract(spark, d, "id", ids, nestedPartCols = Seq("cell")))
  }
}
