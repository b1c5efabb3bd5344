package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling (ANALYZE-style column statistics): per-column
  * non-null count, distinct count, and lexicographic min/max, emitted
  * long-format — one row per profiled column.
  *
  * One scan regardless of column count: every statistic is an
  * aggregate over the same pass, reduced map-side to a single row,
  * then pivoted to long form driver-free (`explode` over an array of
  * structs on a ONE-row relation — no shuffle beyond the global agg's
  * own exchange).
  *
  * Scale: exact `countDistinct` over multiple columns expands the
  * input ×|cols| (Spark's multi-distinct rewrite) — fine for gate
  * scales and narrow tables; at 100 TB pass `approxNdv = true` and
  * the expansion disappears (HLL++ partial aggregates, one pass, no
  * expand; same portable-sketch family as `q_hll_distinct`). Min/max
  * are taken over the STRING form so heterogeneous columns share one
  * output schema — lexicographic, by contract.
  *
  * Streaming: the `approxNdv = true` form is a valid COMPLETE-mode
  * streaming aggregate as-is (count/min/max merge exactly, ndv is the
  * mergeable HLL sketch) — an always-current profile of a document
  * feed; ProfileStreamSpec pins stream ≡ batch over data-so-far. The
  * exact form is batch-only (multi-distinct is not a streaming
  * aggregate).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    require(cols.distinct.size == cols.size,
      s"profile columns must be distinct, got $cols")
    def ndv(c: Column): Column =
      if (approxNdv) approx_count_distinct(c) else countDistinct(c)
    // Internal aliases are indexed by POSITION, not by embedding the raw
    // column name — names with dots/spaces would need quoting and would
    // fail analysis inside the alias. Data references are backtick-quoted
    // for the same reason (a raw `col("a.b")` means nested-field access).
    def c0(c: String): Column = col(s"`$c`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(c0(c)).as(s"__n_$i"),
      ndv(c0(c)).as(s"__ndv_$i"),
      min(c0(c).cast("string")).as(s"__min_$i"),
      max(c0(c).cast("string")).as(s"__max_$i")) }
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val rows = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col(s"__n_$i").as("n_nonnull"),
      col(s"__ndv_$i").as("ndv"),
      col(s"__min_$i").as("min_val"),
      col(s"__max_$i").as("max_val")) }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** [[profile]] extended with rank-adaptive quantile estimates for the
    * numeric columns — ANALYZE + percentiles in one report, the
    * composition a table-health dashboard actually wants. The counts/
    * extrema come from [[profile]]'s single scan; the quantiles come
    * from ONE more scan that melts the numeric columns to
    * (col_name, id, v) rows and runs the bottom-k sample sketch
    * ([[Sketches.kmvSketchAgg]] — map-side cut, exchange bounded at
    * partitions × columns × k) grouped BY COLUMN NAME. Melting costs
    * |numericCols| rows per input row inside the scan, but only the
    * per-column sketches cross the wire. Null values are excluded
    * before sampling (quantiles are over the non-null population —
    * consistent with `n_nonnull`); columns not in `numericCols` carry
    * null quantiles. Rank error is the sketch's uniform O(1/√k)
    * regardless of each column's distribution — the heavy-tail safety
    * a fixed-bin approach cannot give an arbitrary column. */
  def profileWithQuantiles(df: DataFrame, cols: Seq[String],
      numericCols: Seq[String], idCol: String, seed: String,
      k: Int, qs: Seq[(String, Double)],
      approxNdv: Boolean = false): DataFrame = {
    require(numericCols.forall(cols.contains),
      "every quantile column must also be profiled")
    val base = profile(df, cols, approxNdv)
    val melted = df.select(col(idCol).as("_pid"),
        explode(array(numericCols.map(c => struct(
          lit(c).as("col_name"),
          col(s"`$c`").cast("double").as("v"))): _*)).as("m"))
      .select(col("_pid"), col("m.col_name").as("col_name"), col("m.v").as("v"))
      .filter(col("v").isNotNull)
    val sk = Sketches.kmvSketchAgg(melted, Seq("col_name"),
      col("_pid"), col("v"), seed, k)
    base.join(Sketches.kmvQuantiles(sk, Seq("col_name"), k, qs),
      Seq("col_name"), "left")
  }
}
