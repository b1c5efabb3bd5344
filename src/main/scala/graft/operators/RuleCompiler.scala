package graft.operators

import graft.model.{ResourceRule, SyncerConfig}

/** KRMSyncer control-plane: rule validation and glob expansion
  * (SURVEY.md §2.2, C2/C4/C5). Plan-time logic — plain Scala on the
  * driver, no data movement. The expanded (group, version, kind) list is
  * what the streaming layer registers sources for (one query per GVK,
  * deduped — operator C6, see [[graft.streaming.QueryRegistry]]).
  */
object RuleCompiler {

  final case class Gvk(group: String, version: String, kind: String)

  /** One discoverable resource in the catalog: what the reference gets
    * from `ServerGroupsAndResources` (a (groupVersion, resource) pair).
    */
  final case class CatalogResource(group: String, version: String, kind: String,
      name: String, verbs: Seq[String])

  private def isKccGroup(g: String): Boolean =
    g == "*.cnrm.cloud.google.com" || g.endsWith(".cnrm.cloud.google.com") ||
      g == "cnrm.cloud.google.com"

  private def isKccGlob(r: ResourceRule): Boolean =
    isKccGroup(r.group) && r.version == "*" && r.kind == "*"

  /** C2 — validation, faithful to `validateRule`
    * (/root/reference/syncer/controllers/krmsyncer_controller.go:105-116):
    * any `*` anywhere requires (KCC group AND version=* AND kind=*).
    */
  def validateRule(r: ResourceRule): Either[String, ResourceRule] = {
    val hasGlob = r.group.contains("*") || r.version.contains("*") || r.kind.contains("*")
    if (hasGlob && !isKccGlob(r))
      Left("globbing ('*') is only allowed for version and kind if group is KCC (e.g. *.cnrm.cloud.google.com)")
    else Right(r)
  }

  /** C5 — discovery is only needed when some rule globs
    * (krmsyncer_controller.go:212-220): callers may skip building the
    * catalog entirely otherwise. */
  def needsDiscovery(rules: Seq[ResourceRule]): Boolean =
    rules.exists(r => r.group.contains("*") || r.version.contains("*") || r.kind.contains("*"))

  /** C4 — glob expansion against a discovered catalog, faithful to
    * `expandRule` (krmsyncer_controller.go:151-199): a `*.`-group
    * suffix-matches; a concrete KCC group matches exactly; subresources
    * (name contains '/') are skipped; non-glob rules expand to their own
    * singleton without consulting the catalog.
    */
  def expandRule(rule: ResourceRule, catalog: => Seq[CatalogResource]): Either[String, Seq[Gvk]] =
    validateRule(rule).map { r =>
      if (isKccGlob(r)) {
        catalog.iterator
          .filter { res =>
            if (r.group == "*.cnrm.cloud.google.com") res.group.endsWith("cnrm.cloud.google.com")
            else res.group == r.group
          }
          .filterNot(_.name.contains("/"))
          .map(res => Gvk(res.group, res.version, res.kind))
          .toSeq
      } else Seq(Gvk(r.group, r.version, r.kind))
    }

  /** Expand a whole rule set, accumulating per-rule errors instead of
    * failing fast (operator D14 error-tolerance applies at plan time too:
    * an invalid rule gets an InvalidRule condition, the rest still run).
    */
  def expandAll(rules: Seq[ResourceRule], catalog: => Seq[CatalogResource])
      : (Seq[Gvk], Seq[String]) = {
    val results = rules.map(expandRule(_, catalog))
    val gvks = results.collect { case Right(g) => g }.flatten.distinct
    val errs = results.collect { case Left(e) => e }
    (gvks, errs)
  }

  /** C3 — per-syncer discovery source selection, faithful to
    * `getDiscoveryClient` (krmsyncer_controller.go:118-148): a push
    * syncer discovers against the *local* catalog; a pull syncer
    * discovers against the catalog of its remote cluster, identified by
    * (syncer namespace, kubeconfig secret); a pull syncer with no remote
    * configured is an error with the reference's message. `remotes`
    * resolves a remote identity to its catalog — at scale both sides are
    * [[graft.sources.Catalog.discover]] roots.
    */
  def selectCatalog(
      syncer: SyncerConfig,
      local: => Seq[CatalogResource],
      remotes: (String, String) => Option[Seq[CatalogResource]])
      : Either[String, Seq[CatalogResource]] =
    if (syncer.effectiveMode == "push") Right(local)
    else if (syncer.remoteSecret == null)
      Left("remote cluster config missing for Pull mode")
    else remotes(syncer.namespace, syncer.remoteSecret).toRight(
      s"secret ${syncer.remoteSecret} does not exist in namespace ${syncer.namespace}")

  /** C2+C3+C4+C5 composed for one syncer: discovery only happens when a
    * rule globs (C5 — `catalog` stays unforced otherwise); the catalog
    * is mode-selected per syncer (C3); expansion and validation errors
    * accumulate (the reference's reconcile aborts the syncer on a
    * discovery failure — rules still validate, nothing expands).
    */
  def expandSyncer(
      syncer: SyncerConfig,
      local: => Seq[CatalogResource],
      remotes: (String, String) => Option[Seq[CatalogResource]])
      : (Seq[Gvk], Seq[String]) =
    if (!needsDiscovery(syncer.rules)) expandAll(syncer.rules, Seq.empty)
    else selectCatalog(syncer, local, remotes) match {
      case Left(err) => (Seq.empty, Seq(err))
      case Right(cat) => expandAll(syncer.rules, cat)
    }
}
