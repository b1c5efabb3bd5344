package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table utilities — the shuffle-free repeated-join story at
  * 100 TB: write both sides of a hot join bucketed (and sorted) on the
  * join key once, and every subsequent join between them is a
  * sort-merge join with NO exchange on either side — the shuffle was
  * paid at write time, amortized over every downstream query.
  *
  * This is Spark's native co-location mechanism (hash(key) % buckets →
  * file), the batch analog of the sync destination's bucket layout
  * ([[graft.streaming.ParquetDest]]); BucketingSpec pins the plan shape
  * (zero Exchange operators in the bucketed join).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted external parquet table
    * registered as `tableName` (external: data lives at `path`, so the
    * table survives catalog resets and maps onto lake layouts).
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      keys: Seq[String], numBuckets: Int): Unit = {
    require(keys.nonEmpty && numBuckets >= 1)
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Join two co-bucketed tables on their bucket keys. The plan must
    * contain no Exchange when both tables share bucket count and keys —
    * asserted in BucketingSpec. */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
