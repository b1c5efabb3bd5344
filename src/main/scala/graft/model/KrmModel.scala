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
  *
  * `destNamespace` implements the namespace mapping the reference
  * documents but never implemented (syncer/README.md:12 promises
  * "syncing to a specific destination namespace"; controller.go:567
  * always copies the source namespace): when set, matched documents are
  * rewritten into that namespace on the destination — including
  * tombstones, so deletes chase the mapped key.
  */
final case class ResourceRule(
    group: String,
    version: String,
    kind: String,
    namespaces: Seq[String] = Seq.empty,
    syncFields: Seq[String] = Seq("status"),
    destNamespace: String = null)

/** A syncer config, mirroring `KRMSyncerSpec` (krmsyncer_types.go:62-84):
  * mode defaults to "pull" (types.go:74-77), `suspend` short-circuits the
  * whole syncer.
  *
  * `namespace` is the syncer CR's own namespace and `remoteSecret` the
  * kubeconfig secret name of its remote cluster config
  * (types.go:55-65) — together they are the syncer's remote identity:
  *   - push mode: the pair names the *destination* cluster
  *     (getRemoteClient, krmsyncer_controller.go:534-559 resolves the
  *     secret in the syncer's namespace);
  *   - pull mode: the pair names the *source* cluster, and a pull rule
  *     only applies to events from the watcher with the same identity
  *     (controller.go:444-454).
  * `remoteSecret = null` means no remote configured.
  */
final case class SyncerConfig(
    name: String,
    mode: String = "pull",   // "push" | "pull"
    suspend: Boolean = false,
    rules: Seq[ResourceRule] = Seq.empty,
    namespace: String = "default",
    remoteSecret: String = null) {
  def effectiveMode: String = if (mode == null || mode.isEmpty) "pull" else mode

  /** D8 — destination key this syncer routes to: push syncs to its
    * remote cluster, pull syncs to the local cluster
    * (krmsyncer_controller.go:476-487). A push syncer without a remote
    * keeps the legacy single-destination behavior ("local") rather than
    * erroring, so library users without multi-cluster configs are
    * unaffected.
    */
  def destKey: String =
    if (effectiveMode == "push" && remoteSecret != null) s"remote:$namespace/$remoteSecret"
    else SyncerConfig.LocalDest
}

object SyncerConfig {
  /** Destination key of the watcher-local cluster. */
  val LocalDest = "local"
}

/** The identity of the event source feeding a sync micro-batch — the
  * Spark analog of the reference's per-watcher reconciler identity
  * (`DynamicResourceReconciler{Mode, Remote}`,
  * krmsyncer_controller.go:444-454): `mode` is push/pull; for pull
  * watchers, (`remoteNamespace`, `remoteSecret`) name the remote cluster
  * the events came from, and only syncers with the same remote identity
  * apply (D5). A null identity matches any syncer (single-remote
  * deployments).
  */
final case class WatcherId(
    mode: String,
    remoteNamespace: String = null,
    remoteSecret: String = null)

/** Flattened (syncer, rule) row used for the broadcast rules join (D2).
  * Carries the syncer's remote identity (D5 pull-side matching) and its
  * resolved destination key (D8 routing).
  */
final case class FlatRule(
    syncerName: String,
    mode: String,
    suspend: Boolean,
    group: String,
    version: String,
    kind: String,
    namespaces: Seq[String],
    syncFields: Seq[String],
    syncerNamespace: String,
    remoteSecret: String,
    destKey: String,
    destNamespace: String)

object FlatRule {
  def flatten(configs: Seq[SyncerConfig]): Seq[FlatRule] =
    for {
      c <- configs
      r <- c.rules
    } yield FlatRule(c.name, c.effectiveMode, c.suspend, r.group, r.version, r.kind,
      r.namespaces, if (r.syncFields.isEmpty) Seq("status") else r.syncFields,
      c.namespace, c.remoteSecret, c.destKey, r.destNamespace)
}
