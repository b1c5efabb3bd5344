package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central access to the harness parquet tables (TESTDATA.md).
  *
  * Every query receives `sfDir` (e.g. /root/testdata/sf0.01) and reads
  * only the tables it needs — column pruning and predicate pushdown then
  * reach the parquet scan, which is the behavior we need at 100 TB
  * (never materialize a table wider than the projection).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    * default; read it as a long of epoch-nanoseconds (set at read time
    * so the conf holds in any caller's session). Queries convert with
    * [[tsSeconds]] / [[tsHourEpoch]]. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** Epoch seconds from the nanos-long `ts` column. Exact integer math:
    * subtract the remainder first so the division is a representable
    * multiple (a raw double divide of an epoch-nanos value would lose
    * precision — 1.7e18 exceeds the 53-bit mantissa). */
  def tsSeconds(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod}
    ((c - pmod(c, lit(1000000000L))) / 1000000000L).cast("long")
  }

  /** Epoch seconds truncated to the hour (same exact-multiple trick). */
  def tsHourEpoch(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pmod}
    val s = tsSeconds(c)
    s - pmod(s, lit(3600L))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
