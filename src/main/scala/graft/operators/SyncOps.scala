package graft.operators

import graft.functions.functions._
import graft.model.{FlatRule, KrmModel, SyncerConfig, WatcherId}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KRMSyncer data-plane operators (SURVEY.md §2.3) — the per-event
  * "query" the reference interprets row-at-a-time
  * (/root/reference/syncer/controllers/krmsyncer_controller.go:409-532),
  * re-expressed as declarative DataFrame transforms:
  *
  *   events ⨝ broadcast(rules)  (D2)
  *     → suspend/mode/GVK/namespace filters (D3,D4,D6,D7)
  *     → nested-field projection + metadata scrub (D10,D11)
  *     → idempotent merge with tombstone deletes (D9,D12,D13)
  *
  * Scale notes: the rules relation is tiny and slowly-changing → always
  * a broadcast join (no shuffle of the 100 TB event stream). The merge
  * shuffles once on the merge key; everything upstream is a single
  * scan→filter→project stage under whole-stage codegen.
  */
object SyncOps {

  /** Rules config as a small DataFrame (flattened (syncer, rule) pairs). */
  def rulesDF(spark: SparkSession, configs: Seq[SyncerConfig]): DataFrame = {
    import spark.implicits._
    FlatRule.flatten(configs).toDF()
  }

  /** D6 — GVK match including the KCC glob form. Faithful to
    * `ruleMatchesGVK` (krmsyncer_controller.go:395-407): a rule is a KCC
    * glob iff its group is `*.cnrm.cloud.google.com`, ends with
    * `.cnrm.cloud.google.com`, or equals `cnrm.cloud.google.com`, AND
    * version and kind are both `*`. A `*.`-prefixed glob suffix-matches
    * the event group; a concrete KCC group matches exactly.
    */
  def gvkMatch(evGroup: Column, evVersion: Column, evKind: Column,
               rGroup: Column, rVersion: Column, rKind: Column): Column = {
    val isKcc = (rGroup === "*.cnrm.cloud.google.com") ||
      rGroup.endsWith(".cnrm.cloud.google.com") ||
      (rGroup === "cnrm.cloud.google.com")
    val isGlob = isKcc && (rVersion === "*") && (rKind === "*")
    val globMatch = when(rGroup === "*.cnrm.cloud.google.com",
      evGroup.endsWith("cnrm.cloud.google.com")).otherwise(evGroup === rGroup)
    when(isGlob, globMatch)
      .otherwise(evGroup === rGroup && evVersion === rVersion && evKind === rKind)
  }

  /** D7 — namespace membership: empty rule list = all namespaces
    * (krmsyncer_controller.go:462-474). */
  def namespaceMatch(evNs: Column, ruleNamespaces: Column): Column =
    size(ruleNamespaces) === 0 || array_contains(ruleNamespaces, evNs)

  /** D2+D3+D4+D5+D6+D7 — join the event stream against the broadcast
    * rules relation, keeping one output row per matching (event, rule)
    * pair (the reference applies every matching rule; duplicates are fine
    * because the final merge is idempotent). `watcher` is the identity of
    * the event source: its mode must match the rule's (D4), and for a
    * pull watcher with a declared remote identity, only syncers with the
    * same (namespace, kubeconfig-secret) pair apply — the reference's
    * Remote match (krmsyncer_controller.go:444-454) that keeps two
    * remotes' event streams from leaking into each other's rules (D5).
    */
  def matchRules(events: DataFrame, rules: DataFrame, watcher: WatcherId): DataFrame = {
    val e = events.alias("e")
    val r = rules.alias("r")
    val identityOk: Column =
      if (watcher.mode == "pull" && watcher.remoteNamespace != null)
        (col("r.syncerNamespace") === lit(watcher.remoteNamespace)) &&
          (col("r.remoteSecret") === lit(watcher.remoteSecret))    // D5
      else lit(true)
    val cond =
      (!col("r.suspend")) &&                       // D3
      (col("r.mode") === lit(watcher.mode)) &&     // D4
      identityOk &&                                // D5
      gvkMatch(col("e.apiGroup"), col("e.apiVersion"), col("e.kind"),
        col("r.group"), col("r.version"), col("r.kind")) &&  // D6
      namespaceMatch(col("e.namespace"), col("r.namespaces")) // D7
    e.join(broadcast(r), cond, "inner")
  }

  /** Single-identity convenience overload: a watcher known only by mode
    * (single-remote deployments — matches any syncer of that mode). */
  def matchRules(events: DataFrame, rules: DataFrame, watcherMode: String): DataFrame =
    matchRules(events, rules, WatcherId(watcherMode))

  /** D10 — nested-field projection (`filterFields`,
    * krmsyncer_controller.go:561-584): identity columns always retained;
    * each dotted path in `syncFields` copies that payload subtree;
    * missing paths silently skipped. Payloads live in the JSON-string
    * columns `spec` / `status`; dotted paths are relative to the document
    * root (`spec`, `status`, `spec.resourceID`).
    */
  def filterFields(df: DataFrame, syncFields: Seq[String]): DataFrame = {
    val fields = if (syncFields.isEmpty) Seq("status") else syncFields
    def projected(payloadCol: String): Column = {
      val whole = fields.contains(payloadCol)
      val subs = fields.filter(_.startsWith(payloadCol + ".")).map(_.stripPrefix(payloadCol + "."))
      if (whole) col(payloadCol)
      else if (subs.nonEmpty) json_project(col(payloadCol), subs)
      else lit(null).cast("string")
    }
    val passthrough = df.columns.filter(c => c == "op").map(col).toSeq
    df.select((KrmModel.identityCols.map(col) ++
      Seq(projected("spec").as("spec"), projected("status").as("status")) ++
      passthrough): _*)
  }

  /** Variant of D10 where each row carries its own `syncFields` array
    * column (the shape produced by [[matchRules]]): the comma-joined path
    * list is passed per-row into the projection expression.
    */
  def filterFieldsPerRow(df: DataFrame, syncFieldsCol: Column): DataFrame = {
    import graft.functions.{JsonProjectExpr}
    import org.apache.spark.sql.graft.bridge
    def proj(payloadCol: String): Column = {
      // paths under this payload root, prefix-stripped and comma-joined
      val subsRel = array_join(
        transform(
          filter(syncFieldsCol, f => f.startsWith(payloadCol + ".")),
          f => regexp_replace(f, "^" + payloadCol + "\\.", "")), ",")
      val whole = array_contains(syncFieldsCol, payloadCol)
      when(whole, col(payloadCol))
        .when(length(subsRel) > 0,
          bridge.column(JsonProjectExpr(bridge.expression(col(payloadCol)),
            bridge.expression(subsRel))))
        .otherwise(lit(null).cast("string"))
    }
    val passthrough =
      df.columns.filter(c => c == "op" || c == "syncerName" || c == "destKey").map(col).toSeq
    // Namespace mapping (README.md:12, absent from the reference's code):
    // a rule with destNamespace rewrites the document — and its
    // tombstones — into that namespace on the destination.
    def identity(c: String): Column =
      if (c == "namespace" && df.columns.contains("destNamespace"))
        coalesce(col("r.destNamespace"), col("e.namespace")).as("namespace")
      else col("e." + c).as(c)
    df.select((KrmModel.identityCols.map(identity) ++
      Seq(proj("spec").as("spec"), proj("status").as("status")) ++
      passthrough): _*)
  }

  /** D11 — system-metadata scrub: the outgoing document never carries
    * resourceVersion/uid/generation/managedFields
    * (krmsyncer_controller.go:517-521). On the canonical DataFrame these
    * are plain columns, so scrubbing is a projection (free under column
    * pruning — the parquet scan never reads them).
    */
  def scrubSystemMetadata(df: DataFrame): DataFrame =
    df.drop(KrmModel.scrubCols: _*)

  /** D1-for-snapshot-sources — synthesize a CDC event batch from two
    * consecutive FULL snapshots: upserts for keys that are new or whose
    * payload changed, tombstones (`op='delete'`) for keys that vanished,
    * nothing for unchanged keys. This reproduces the reference's
    * NotFound→isDeleted semantics
    * (/root/reference/syncer/controllers/krmsyncer_controller.go:415-423)
    * for sources that can't watch — a watch source *observes* deletes; a
    * snapshot source must *infer* them, and without this diff a
    * snapshot-only pipeline silently never deletes.
    *
    * Change detection is a digest over the payload columns (apiVersion,
    * labels, annotations, spec, status), null-safe on both sides, so
    * re-upserting an unchanged document costs nothing downstream. The
    * output has the event-stream shape ([[KrmModel.krmSchema]] minus the
    * scrub columns a destination snapshot doesn't carry, plus `op`) and
    * feeds the existing plan/merge path unchanged.
    *
    * Scale: ONE full-outer shuffle join on the merge key — both sides
    * partition once; at 100 TB store consecutive snapshots bucketed on
    * the merge key (the [[graft.streaming.ParquetDest]] layout or
    * `bucketBy`) and the join co-locates without a shuffle. The emitted
    * batch is only the churn (typically ≪ snapshot size), so everything
    * downstream scales with change volume, not corpus volume.
    */
  def snapshotDiff(prev: DataFrame, curr: DataFrame): DataFrame = {
    val key = KrmModel.mergeKey
    val payload = Seq("apiVersion", "labels", "annotations", "spec", "status")
    def digest(side: String): Column =
      md5(to_json(struct(payload.map(c => col(side + "." + c)): _*)))
    val p = prev.alias("p")
    val c = curr.alias("c")
    val joinCond = key.map(k => col("p." + k) <=> col("c." + k)).reduce(_ && _)
    val hasC = col("c.name").isNotNull
    val hasP = col("p.name").isNotNull
    val changed = !(digest("c") <=> digest("p"))
    p.join(c, joinCond, "full_outer")
      .filter(!hasC || !hasP || changed)
      .select((
        key.map(k => coalesce(col("c." + k), col("p." + k)).as(k)) ++ Seq(
          // tombstones keep the vanished document's apiVersion (the
          // identity they chase); payloads are null like watch tombstones
          when(hasC, col("c.apiVersion")).otherwise(col("p.apiVersion")).as("apiVersion"),
          when(hasC, col("c.labels")).otherwise(lit(null)).as("labels"),
          when(hasC, col("c.annotations")).otherwise(lit(null)).as("annotations"),
          when(hasC, col("c.spec")).otherwise(lit(null).cast("string")).as("spec"),
          when(hasC, col("c.status")).otherwise(lit(null).cast("string")).as("status"),
          when(hasC, lit("upsert")).otherwise(lit("delete")).as("op"))): _*)
      .select("apiGroup", "apiVersion", "kind", "namespace", "name",
        "labels", "annotations", "spec", "status", "op")
  }

  /** D9+D12+D13 — idempotent merge of a (possibly replayed) batch of
    * projected documents into a destination snapshot:
    *
    *   - tombstones (`op='delete'`) remove the key (NotFound ignored);
    *   - upserts field-merge `spec` (SSA ForceOwnership semantics via
    *     [[graft.functions.functions.json_merge_shallow]]) and replace
    *     `status` via the separate status write path (D13: the reference
    *     patches status as its own subresource apply);
    *   - unmatched upserts insert.
    *
    * Multiple rule matches for one key within a batch collapse
    * deterministically (ordered by syncerName, then rule projection
    * merge) before the merge, so replaying a batch is a no-op
    * (at-least-once → exactly-once visible effects).
    *
    * At 100 TB the same plan runs as a storage-level MERGE (Delta/Iceberg
    * `whenMatched`/`whenNotMatched`) inside `foreachBatch`; here the
    * destination is a plain DataFrame so correctness is testable without
    * a table format. One shuffle on the merge key; updates side is the
    * small side per micro-batch.
    */
  def mergeBatch(dest: DataFrame, updates: DataFrame): DataFrame = {
    val key = KrmModel.mergeKey
    // Collapse the batch to one row per key: last op wins; upserts fold
    // their payloads in deterministic order.
    val ordCol = if (updates.columns.contains("syncerName")) col("syncerName") else lit("")
    val collapsed = updates
      .withColumn("_ord", ordCol)
      .groupBy(key.map(col): _*)
      .agg(
        max_by(struct(col("apiVersion"), col("labels"), col("annotations"), col("op")), col("_ord")).as("_last"),
        // fold spec/status merges in _ord order
        aggregate(
          array_sort(collect_list(struct(col("_ord").as("o"), col("spec").as("s")))),
          lit(null).cast("string"),
          (acc, x) => json_merge_shallow(acc, x.getField("s"))).as("spec"),
        aggregate(
          array_sort(collect_list(struct(col("_ord").as("o"), col("status").as("s")))),
          lit(null).cast("string"),
          (acc, x) => json_merge_shallow(acc, x.getField("s"))).as("status"))
      .select(col("apiGroup"), col("_last.apiVersion").as("apiVersion"), col("kind"),
        col("namespace"), col("name"), col("_last.labels").as("labels"),
        col("_last.annotations").as("annotations"), col("spec"), col("status"),
        col("_last.op").as("op"))

    val d = dest.alias("d")
    val u = collapsed.alias("u")
    val joinCond = key.map(k => col("d." + k) <=> col("u." + k)).reduce(_ && _)
    val joined = d.join(u, joinCond, "full_outer")
    val isDelete = col("u.op") === "delete"
    val hasU = col("u.name").isNotNull
    val hasD = col("d.name").isNotNull

    def pick(c: String): Column = when(hasU, col("u." + c)).otherwise(col("d." + c))
    joined
      .filter(!(hasU && isDelete)) // D9: tombstone removes matched + is a no-op unmatched
      .select(
        (key.map(k => coalesce(col("u." + k), col("d." + k)).as(k)) ++ Seq(
          pick("apiVersion").as("apiVersion"),
          pick("labels").as("labels"),
          pick("annotations").as("annotations"),
          // D12: field-subset merge of spec when both sides exist
          when(hasU && hasD, json_merge_shallow(col("d.spec"), col("u.spec")))
            .when(hasU, col("u.spec")).otherwise(col("d.spec")).as("spec"),
          // D13: status subresource is applied wholesale by its own patch
          when(hasU, coalesce(col("u.status"), col("d.status")))
            .otherwise(col("d.status")).as("status"))): _*)
      .select("apiGroup", "apiVersion", "kind", "namespace", "name",
        "labels", "annotations", "spec", "status")
  }
}
