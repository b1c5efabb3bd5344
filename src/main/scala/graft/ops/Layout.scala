package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton-curve) clustering across MULTIPLE filter columns.
    * [[writeClustered]] on one column makes that column's row-group
    * spans tight and leaves every other column's spans full-range — a
    * table filtered sometimes by user and sometimes by time prunes
    * nothing on the second pattern. Interleaving the bits of both
    * columns into one sort key makes each row group a hyper-rectangle
    * of the multi-dim space: with `numFiles` splits, each dimension's
    * spans shrink by ~numFiles^(1/d) instead of one dimension taking
    * the whole numFiles× collapse — the standard lakehouse trade when
    * no single filter column dominates.
    *
    * Mechanics: per-column bounds come from ONE tiny min/max agg (a
    * single collected row — the normalization that lets a 0..1500 user
    * id interleave meaningfully with epoch-nanos timestamps); each
    * column scales to `bits` bits; the z-value is a statically unrolled
    * OR of shift/mask terms (plain `functions` ops — whole-stage
    * codegen, no UDF); then range-partition + sort-within on z exactly
    * like [[writeClustered]]. The z column is dropped before write —
    * layout is invisible in the schema, visible only in the footers
    * ([[rowGroupRanges]]) and the bytes a filtered scan reads.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit = {
    require(zCols.size >= 2,
      "z-order needs >= 2 columns; use writeClustered for one")
    require(numFiles > 0, "numFiles must be positive")
    require(bits > 0 && bits * zCols.size <= 62,
      s"bits*cols must fit a long: $bits*${zCols.size}")
    val aggExprs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    require(!bounds.anyNull,
      s"z-order columns must be non-null numeric (empty input or all-null column among ${zCols.mkString(",")})")
    val scale = 1L << bits
    val scaled: Seq[Column] = zCols.indices.map { i =>
      val lo = bounds.getDouble(2 * i)
      val span = math.max(bounds.getDouble(2 * i + 1) - lo, 1.0)
      least(lit(scale - 1), greatest(lit(0L),
        ((col(zCols(i)).cast("double") - lit(lo)) / lit(span) *
          lit(scale.toDouble)).cast("long")))
    }
    val n = zCols.size
    val zv = (for { b <- 0 until bits; i <- 0 until n }
      yield shiftleft(shiftright(scaled(i), b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_ bitwiseOR _)
    df.withColumn("_z", zv)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed write: pre-shuffle a table ONCE at write time so every
    * later equi-join/aggregation on the bucket key runs shuffle-free.
    * A 100 TB fact table joined on its key in every downstream query
    * otherwise re-shuffles 100 TB per query; bucketing moves that
    * exchange into the single write. `bucketBy` + `sortBy` records the
    * hash-partitioning AND per-bucket order in the catalog, so Spark
    * plans a sort-merge join over co-located bucket files with no
    * Exchange (and no re-sort) on either bucketed side — LayoutSpec
    * asserts exactly that plan shape against the raw-scan control.
    *
    * The table registers in the session catalog with its data at
    * `path` (external table) — callers pass scratch or warehouse
    * storage; nothing writes to a default warehouse root. Read back
    * with `spark.table(tableName)`: the bucketing metadata lives in
    * the catalog entry, not the files, so a plain parquet read of the
    * same path would shuffle again. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(numBuckets > 0, "numBuckets must be positive")
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path)
      .saveAsTable(tableName)
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
