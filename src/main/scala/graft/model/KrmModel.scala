package graft.model

import org.apache.spark.sql.types._

/** Canonical data model for dynamic KRM-style documents (SURVEY.md §1.4).
  *
  * The reference's unit of data is a schemaless nested document
  * (`unstructured.Unstructured`, /root/reference/syncer/controllers/
  * krmsyncer_controller.go:413-414). We model it as a DataFrame with fixed
  * identity columns and the dynamic payload kept as JSON *strings* — this
  * keeps the engine schema-stable at 100 TB (no schema-union explosion
  * across millions of heterogeneous objects); typed views are derived on
  * demand with `from_json` and never stored.
  */
object KrmModel {

  /** Canonical KRM document schema. `op` is the CDC operation column used
    * by the streaming path ("upsert" | "delete"); batch snapshots carry
    * "upsert" everywhere.
    */
  val krmSchema: StructType = StructType(Seq(
    StructField("apiGroup", StringType, nullable = true),
    StructField("apiVersion", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("namespace", StringType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("labels", MapType(StringType, StringType), nullable = true),
    StructField("annotations", MapType(StringType, StringType), nullable = true),
    StructField("spec", StringType, nullable = true),    // JSON
    StructField("status", StringType, nullable = true),  // JSON
    // System metadata that the sync pipeline must scrub before loading
    // (reference scrubs resourceVersion/uid/generation/managedFields,
    // krmsyncer_controller.go:517-521).
    StructField("resourceVersion", StringType, nullable = true),
    StructField("uid", StringType, nullable = true),
    StructField("generation", LongType, nullable = true),
    StructField("managedFields", StringType, nullable = true),
    StructField("op", StringType, nullable = true)
  ))

  /** Identity columns that the projection operator always retains
    * (reference copies GVK + name + namespace + labels + annotations,
    * krmsyncer_controller.go:562-569).
    */
  val identityCols: Seq[String] =
    Seq("apiGroup", "apiVersion", "kind", "namespace", "name", "labels", "annotations")

  /** System-metadata columns scrubbed before apply (D11). */
  val scrubCols: Seq[String] =
    Seq("resourceVersion", "uid", "generation", "managedFields")

  /** Merge key of a KRM document — what makes the upsert idempotent. */
  val mergeKey: Seq[String] = Seq("apiGroup", "kind", "namespace", "name")
}

/** A single sync rule, mirroring the reference's `ResourceRule`
  * (/root/reference/syncer/api/v1alpha1/krmsyncer_types.go:24-40): GVK
  * selector (glob allowed only for KCC groups), optional namespace
  * allow-list (empty = all), and the list of payload field paths to
  * project (default `["status"]`, types.go:37-38).
  */
final case class ResourceRule(
    group: String,
    version: String,
    kind: String,
    namespaces: Seq[String] = Seq.empty,
    syncFields: Seq[String] = Seq("status"))

/** A syncer config, mirroring `KRMSyncerSpec` (krmsyncer_types.go:62-84):
  * mode defaults to "pull" (types.go:74-77), `suspend` short-circuits the
  * whole syncer.
  */
final case class SyncerConfig(
    name: String,
    mode: String = "pull",   // "push" | "pull"
    suspend: Boolean = false,
    rules: Seq[ResourceRule] = Seq.empty) {
  def effectiveMode: String = if (mode == null || mode.isEmpty) "pull" else mode
}

/** Flattened (syncer, rule) row used for the broadcast rules join (D2). */
final case class FlatRule(
    syncerName: String,
    mode: String,
    suspend: Boolean,
    group: String,
    version: String,
    kind: String,
    namespaces: Seq[String],
    syncFields: Seq[String])

object FlatRule {
  def flatten(configs: Seq[SyncerConfig]): Seq[FlatRule] =
    for {
      c <- configs
      r <- c.rules
    } yield FlatRule(c.name, c.effectiveMode, c.suspend, r.group, r.version, r.kind,
      r.namespaces, if (r.syncFields.isEmpty) Seq("status") else r.syncFields)
}
