package graft.ops

import org.apache.spark.sql.SparkSession

/** Epoch compaction for batch-partitioned sinks — the small-files
  * control every epoch-appending layout eventually needs: each gated
  * micro-batch adds a `batch=<id>` directory
  * ([[graft.streaming.IngestGate]]), so a long-running stream
  * accumulates thousands of small partitions whose listing and footer
  * overhead comes to dominate probe cost. Compaction collapses every
  * existing epoch into ONE base generation (`batch=<baseId>`,
  * default −1), preserving nested partition levels (the ANN index's
  * `cell=`), with the same temp-then-swap discipline as
  * [[Retraction]]: readers see old epochs until the swap, never a
  * half-written base.
  *
  * Interplay with streaming replay (the ONE rule): compact only epochs
  * at or below the stream's committed checkpoint horizon. The gate's
  * replay idempotence excludes `batch = batchId` from its probe; a
  * pre-compaction epoch replayed AFTER compaction would find its own
  * rows in the base and self-reject. Epochs the checkpoint has
  * committed are never re-delivered, so compacting them is safe —
  * standard log-compaction discipline (CompactionSpec pins that reads
  * are identical, appends continue, and post-compaction NEW epochs
  * stay replay-idempotent).
  */
object Compaction {

  /** Collapse all `partCol=` partitions under `dir` into one base
    * partition. Returns the number of epoch partitions collapsed. */
  def compactEpochs(spark: SparkSession, dir: String,
      partCol: String = "batch", nestedPartCols: Seq[String] = Nil,
      baseId: Long = -1L): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return 0
    val epochDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol="))
      .map(_.getPath)
    if (epochDirs.length <= 1) return 0
    val tmp = new org.apache.hadoop.fs.Path(root, s".compact-$partCol")
    val all = spark.read.parquet(dir).drop(partCol)
    val writer = all.write.mode("overwrite")
    (if (nestedPartCols.nonEmpty) writer.partitionBy(nestedPartCols: _*)
     else writer).parquet(tmp.toString)
    epochDirs.foreach(p => fs.delete(p, true))
    fs.rename(tmp, new org.apache.hadoop.fs.Path(root, s"$partCol=$baseId"))
    epochDirs.length
  }

  /** Compact every sink the ingest gate maintains. */
  def compactAll(spark: SparkSession, acceptedDir: String, indexDir: String,
      annDir: Option[String] = None): Unit = {
    compactEpochs(spark, acceptedDir)
    compactEpochs(spark, indexDir)
    annDir.foreach(d => compactEpochs(spark, d, nestedPartCols = Seq("cell")))
    ()
  }
}
