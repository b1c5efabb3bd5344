package graft.sources

import graft.operators.RuleCompiler.CatalogResource
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.{Failure, Success, Try}

/** Source catalog — the Spark analog of the reference's discovery scan
  * (B2, /root/reference/pkg/export/export.go:88-109): enumerate every
  * "table" under a data root. A cluster's resource types map to one
  * parquet/json table per GVK; discovery is a directory listing (or
  * `spark.catalog.listTables` when a metastore exists).
  *
  * Partial-failure tolerance is part of the operator's contract: the
  * reference tolerates partially-failed discovery (export.go:100-109) and
  * per-table scan errors (export.go:130-134 collects, continues). We
  * return successes alongside accumulated errors — never fail-fast.
  */
object Catalog {

  final case class TableRef(name: String, path: String)
  final case class ScanResult(frames: Map[String, DataFrame], errors: Seq[String])

  /** B2 — enumerate tables under a root directory (one file/dir per
    * table). Hadoop FS API so the same code works on local FS, HDFS or
    * object stores at scale.
    */
  def discover(spark: SparkSession, root: String): (Seq[TableRef], Seq[String]) = {
    Try {
      val path = new org.apache.hadoop.fs.Path(root)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(path).toSeq
        .map(_.getPath)
        .filter(p => p.getName.endsWith(".parquet") || fs.getFileStatus(p).isDirectory)
        .map(p => TableRef(p.getName.stripSuffix(".parquet"), p.toString))
        .sortBy(_.name)
    } match {
      case Success(ts) => (ts, Nil)
      case Failure(e)  => (Nil, Seq(s"discovery failed for $root: ${e.getMessage}"))
    }
  }

  /** B5 + B11 — scan every discovered table, accumulating per-table
    * errors instead of aborting (errors.Join semantics, export.go:167).
    */
  def scanAll(spark: SparkSession, tables: Seq[TableRef]): ScanResult = {
    val attempts = tables.map { t =>
      t.name -> Try(spark.read.parquet(t.path))
    }
    ScanResult(
      frames = attempts.collect { case (n, Success(df)) => n -> df }.toMap,
      errors = attempts.collect { case (n, Failure(e)) => s"$n: ${e.getMessage}" })
  }

  /** In-memory catalog view for the rule compiler: each discovered table
    * is a listable resource (mirrors APIResourceList). Verbs are
    * synthesized: parquet tables are list+watch-able.
    */
  def asResources(tables: Seq[TableRef], group: String = "", version: String = "v1")
      : Seq[CatalogResource] =
    tables.map(t => CatalogResource(group, version, t.name.capitalize, t.name,
      Seq("get", "list", "watch")))
}
