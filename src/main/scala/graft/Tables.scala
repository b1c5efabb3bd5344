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

  /** Root of the committed media fixtures (`fixtures/images`,
    * `fixtures/media`, and their manifests). Resolved from
    * `SPARK_GRAFT_FIXTURES_DIR` (the k8s jobs mount the repo elsewhere)
    * falling back to the local checkout path — the same override
    * pattern as `SPARK_GRAFT_SF_DIR`. */
  def fixturesDir: String =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURES_DIR", "/root/repo/fixtures")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is normalized to a LONG of epoch-nanoseconds no matter
    * the physical parquet type, so downstream integer-exact time math
    * ([[tsSeconds]] / [[tsHourEpoch]]) and the Z-order interleave see a
    * stable numeric column across data regenerations:
    *  - TIMESTAMP(NANOS) files (Spark rejects by default) read as the
    *    nanos long directly via `nanosAsLong`;
    *  - TIMESTAMP(MICROS/MILLIS) files (possibly NTZ) read as timestamp
    *    and convert (`unix_micros * 1000` — exact, no float). The NTZ →
    *    instant cast goes through the session timezone, which is pinned
    *    UTC here so the wall-clock is read exactly as DuckDB's `epoch()`
    *    reads a naive timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        import org.apache.spark.sql.functions.{col, unix_micros}
        s.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
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
