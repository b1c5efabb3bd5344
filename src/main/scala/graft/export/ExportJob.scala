package graft.export

import graft.operators.ExportOps
import graft.sinks.ZipSink
import graft.sources.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The batch snapshot export job (SURVEY.md §2.1 / §3.1): the Spark
  * re-expression of `kube-etl export` (/root/reference/pkg/export/
  * export.go:64-168).
  *
  *   discover tables (B2) → capability/subresource filters (B3,B4)
  *   → per-table scan (B5) → defaulting (B6) → path derivation (B7)
  *   → serialization (B8) → archive sink (B9,B10), with per-record
  *   error accumulation (B11).
  *
  * Where the reference is sequential (one List per GVR, one thread), the
  * Spark plan scans all tables in parallel and unions them; each table's
  * scan→project stage is whole-stage codegen'd. YAML rendering happens
  * only at the sink edge.
  */
object ExportJob {

  final case class ExportResult(entries: Long, errors: Seq[String])

  /** Build the (path, data) DataFrame for one canonical-KRM table. The
    * document payload is serialized from identity + payload columns; data
    * is the YAML surface form rendered at the sink edge, so here we keep
    * canonical JSON.
    */
  def entriesFor(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    require(Set("kind", "name").subsetOf(cols), s"not a KRM table: ${cols.mkString(",")}")
    val ns = if (cols.contains("namespace")) col("namespace") else lit(null).cast("string")
    val group = if (cols.contains("apiGroup")) col("apiGroup") else lit(null).cast("string")
    df.select(
      ExportOps.krmPath(ns, group, col("kind"), col("name")).as("path"),
      ExportOps.serializeJson(struct(df.columns.map(col).toIndexedSeq: _*)).as("data"))
  }

  /** The 100 TB export path: no archive at all — write the rendered
    * entries as parquet partitioned by (namespace, kind), so downstream
    * consumers get partition pruning and the write parallelizes across
    * the cluster (SURVEY.md §2.1 B10 scale note). The zip modes remain
    * for reference-parity single-archive exports.
    */
  def runPartitioned(spark: SparkSession, root: String, outDir: String): ExportResult = {
    val (tables, discErrs) = Catalog.discover(spark, root)
    val scan = Catalog.scanAll(spark, tables)
    val frames = scan.frames.toSeq.sortBy(_._1).flatMap { case (_, df) =>
      val cols = df.columns.toSet
      if (!Set("kind", "name").subsetOf(cols)) None
      else {
        val ns = if (cols.contains("namespace")) col("namespace") else lit(null).cast("string")
        Some(df.select(
          ExportOps.defaultNamespace(ns).as("namespace"),
          col("kind"),
          col("name"),
          ExportOps.serializeJson(struct(df.columns.map(col).toIndexedSeq: _*)).as("doc")))
      }
    }
    if (frames.isEmpty) return ExportResult(0L, discErrs ++ scan.errors)
    val unioned = frames.reduce(_ unionByName _)
    unioned.write.mode("overwrite").partitionBy("namespace", "kind").parquet(outDir)
    ExportResult(spark.read.parquet(outDir).count(), discErrs ++ scan.errors)
  }

  /** Discover, scan, render: the shared head of every zip-mode export.
    * Returns the rendered (path, data) frame (None when no table
    * survived) plus accumulated errors (B11 — never fail-fast).
    */
  private def renderedEntries(spark: SparkSession, root: String)
      : (Option[DataFrame], Seq[String]) = {
    val (tables, discErrs) = Catalog.discover(spark, root)
    val scan = Catalog.scanAll(spark, tables)
    val attempts = scan.frames.toSeq.sortBy(_._1).map { case (name, df) =>
      scala.util.Try(entriesFor(df)) match {
        case scala.util.Success(e) => Right(e)
        case scala.util.Failure(ex) => Left(s"$name: ${ex.getMessage}")
      }
    }
    val frames = attempts.collect { case Right(df) => df }
    val errs = discErrs ++ scan.errors ++ attempts.collect { case Left(e) => e }
    if (frames.isEmpty) (None, errs)
    else {
      val unioned = frames.reduce(_ unionByName _)
      // YAML at the edge: rendered per entry inside the single sink pass —
      // the sink's own entry count is the result, so the expression is
      // evaluated exactly once per row (no count() pre-pass). to_yaml is a
      // Catalyst expression, not a UDF, so it stays analyzable/prunable.
      (Some(unioned.select(col("path"),
        graft.functions.functions.to_yaml(col("data")).as("data"))), errs)
    }
  }

  /** Run the full export of a KRM data root into a zip archive.
    * `sharded=true` writes one archive per partition (the scale path).
    */
  def run(spark: SparkSession, root: String, out: String, sharded: Boolean = false): ExportResult =
    renderedEntries(spark, root) match {
      case (None, errs) => ExportResult(0L, errs)
      case (Some(rendered), errs) =>
        val n =
          if (sharded) ZipSink.writeSharded(rendered, out)
          else ZipSink.writeSingle(rendered, out)
        ExportResult(n, errs)
    }

  /** Zip export partitioned by the entries' first path segment (the
    * namespace, per B7 path derivation): archive names carry the
    * segment, so the `graft-zip` reader prunes whole archives against a
    * `path` prefix filter — the layout to pick when downstream reads are
    * namespace-scoped (see [[graft.sinks.ZipSink.writePartitionedByPrefix]]).
    */
  def runPartitionedZip(spark: SparkSession, root: String, outDir: String): ExportResult =
    renderedEntries(spark, root) match {
      case (None, errs) => ExportResult(0L, errs)
      case (Some(rendered), errs) =>
        ExportResult(ZipSink.writePartitionedByPrefix(rendered, outDir), errs)
    }
}
