package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch export pipeline operators (SURVEY.md §2.1, reference
  * `kube-etl export`, /root/reference/pkg/export/export.go).
  *
  * Each operator is a pure DataFrame→DataFrame (or Column) function so
  * Catalyst can fuse the whole chain into one whole-stage-codegen'd scan:
  * filter → project → serialize stays a single stage with predicate
  * pushdown into the source scan. Nothing here touches the driver.
  */
object ExportOps {

  /** B3 — capability predicate: keep resources whose verb list contains
    * `verb` (reference keeps "list"-able resources, export.go:119-121).
    * `verbs` is a comma-separated string column or an array column.
    */
  def verbFilter(df: DataFrame, verbsCol: Column, verb: String): DataFrame =
    df.filter(array_contains(
      if (isArray(df, verbsCol)) verbsCol else split(verbsCol, ","), verb))

  private def isArray(df: DataFrame, c: Column): Boolean =
    scala.util.Try(df.select(c).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]).getOrElse(false)

  /** B4 — subresource filter: drop resource names containing '/'
    * (e.g. `pods/status`; export.go:123-126). */
  def subresourceFilter(df: DataFrame, nameCol: Column): DataFrame =
    df.filter(!nameCol.contains("/"))

  /** B6 — defaulting projection: empty namespace → "_cluster", empty
    * group → "core" (export.go:136-148). Null-safe: null behaves like
    * empty, matching Go's zero-value strings. */
  def defaultNamespace(c: Column): Column =
    when(c.isNull || c === "", lit("_cluster")).otherwise(c)
  def defaultGroup(c: Column): Column =
    when(c.isNull || c === "", lit("core")).otherwise(c)

  /** B7 — output path derivation: `ns/group/kind/name.yaml`
    * (export.go:150). Purely compositional — no custom expression needed
    * (SURVEY §4: krm_path is trivially composable from builtins). */
  def krmPath(ns: Column, group: Column, kind: Column, name: Column): Column =
    concat_ws("/", defaultNamespace(ns), defaultGroup(group), kind,
      concat(name, lit(".yaml")))

  /** B8 — document serialization. Canonical JSON via the codegen'd
    * builtin `to_json`; the YAML surface form is produced only at the
    * archive-sink edge (see [[graft.functions.Yaml]]) because golden
    * comparisons are structural, not textual (SURVEY §7.3). */
  def serializeJson(payload: Column): Column = to_json(payload)
}
