package graft

import graft.queries.QueryCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * LLM-pipeline extensions) to a DataFrame program over the harness
  * tables; `oracleSql` carries the DuckDB-equivalent SQL for each
  * SQL-expressible entry. Implementations live in
  * [[graft.queries.QueryCatalog]] and the operator packages it calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composed sync data plane: change events joined against
    * broadcast rules, filtered, payload-projected. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.syncPipelineFiltered(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all ++ graft.queries.ExtraQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.CorpusOpsQueries.all ++
      graft.queries.CorpusMlQueries.all ++
      graft.queries.ServeQueries.all ++
      graft.queries.LifecycleQueries.all ++
      graft.queries.EvalQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded MinHash/LSH/xxhash64 signatures, heuristic language ID) —
    * those are asserted in ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    QueryCatalog.oracles ++ graft.queries.ExtraQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.CorpusOpsQueries.oracles ++
      graft.queries.CorpusMlQueries.oracles ++
      graft.queries.ServeQueries.oracles ++
      graft.queries.LifecycleQueries.oracles ++
      graft.queries.EvalQueries.oracles
}
