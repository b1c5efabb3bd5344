package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Write-time data layout for scan pruning — the storage-side lever the
  * read-side pushdown needs. Spark prunes directory PARTITIONS for
  * free, but a 100 TB table can't directory-partition by every filter
  * column; for everything else the parquet reader skips ROW GROUPS
  * whose column min/max stats exclude the predicate — which only helps
  * if the writer made those ranges narrow. [[writeClustered]] does
  * exactly that: range-partition by the cluster columns, sort within
  * partitions, write — so each file covers a narrow slice of the
  * cluster key and each row group within it a narrower one, and a
  * point/range predicate touches a handful of row groups instead of
  * all of them.
  *
  * The layout changes NOTHING about query results (LayoutSpec pins
  * clustered ≡ raw under filters; the `q_layout_scan` oracle hash-gates
  * a roundtrip), only which bytes a filtered scan reads.
  * [[rowGroupRanges]] is the auditing surface: the per-row-group
  * min/max spans that make the skipping claim measurable rather than
  * asserted.
  */
object Layout {

  /** Cluster `df` on `clusterCols` into `numFiles` range partitions and
    * write as parquet. Sorting within partitions tightens PAGE and
    * row-group stats; range partitioning makes whole FILES prunable. */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int): Unit = {
    require(clusterCols.nonEmpty, "need at least one cluster column")
    require(numFiles > 0, "numFiles must be positive")
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-row-group (min, max) of a long column across all parquet files
    * under `dir` — the direct measure of layout quality: the narrower
    * these ranges, the more row groups a range predicate skips. Footer
    * reads only; no data pages touched. */
  def rowGroupRanges(spark: SparkSession, dir: String,
      column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    files.toSeq.flatMap { s =>
      val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(s.getPath, conf))
      try rdr.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .getOrElse(throw new IllegalArgumentException(
            s"column $column not found in ${s.getPath}"))
        val st = c.getStatistics
        (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
          st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
      } finally rdr.close()
    }
  }
}
