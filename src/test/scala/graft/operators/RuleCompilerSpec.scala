package graft.operators

import graft.model.ResourceRule
import graft.operators.RuleCompiler._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's table-driven unit tests
  * (/root/reference/syncer/controllers/krmsyncer_glob_test.go):
  * TestValidateRule's 5 cases and TestRuleMatchesGVK via expansion.
  */
class RuleCompilerSpec extends AnyFunSuite {

  test("valid KCC glob accepted") {
    assert(validateRule(ResourceRule("*.cnrm.cloud.google.com", "*", "*")).isRight)
    assert(validateRule(ResourceRule("kcc.cnrm.cloud.google.com", "*", "*")).isRight)
    assert(validateRule(ResourceRule("cnrm.cloud.google.com", "*", "*")).isRight)
  }

  test("glob with non-KCC group rejected") {
    assert(validateRule(ResourceRule("*.example.com", "*", "*")).isLeft)
  }

  test("KCC group with non-glob version rejected") {
    assert(validateRule(ResourceRule("*.cnrm.cloud.google.com", "v1", "*")).isLeft)
  }

  test("KCC group with non-glob kind rejected") {
    assert(validateRule(ResourceRule("*.cnrm.cloud.google.com", "*", "Thing")).isLeft)
  }

  test("no glob always valid") {
    assert(validateRule(ResourceRule("apps", "v1", "Deployment")).isRight)
  }

  private val catalog = Seq(
    CatalogResource("kcc.cnrm.cloud.google.com", "v1alpha1", "KCCResource", "kccresources", Seq("list")),
    CatalogResource("fake.cnrm.cloud.google.com", "v1beta1", "FakeObject", "fakeobjects", Seq("list")),
    CatalogResource("fake.cnrm.cloud.google.com", "v1beta1", "FakeStatus", "fakeobjects/status", Seq("get")),
    CatalogResource("e2e.gkelabs.io", "v1alpha1", "TestCRD", "testcrds", Seq("list")),
    CatalogResource("other.io", "v1", "Other", "others", Seq("list")))

  test("glob expansion: suffix match, subresources skipped") {
    val Right(gvks) = expandRule(ResourceRule("*.cnrm.cloud.google.com", "*", "*"), catalog)
    assert(gvks.toSet == Set(
      Gvk("kcc.cnrm.cloud.google.com", "v1alpha1", "KCCResource"),
      Gvk("fake.cnrm.cloud.google.com", "v1beta1", "FakeObject")))
  }

  test("concrete KCC group glob matches that group only") {
    val Right(gvks) = expandRule(ResourceRule("kcc.cnrm.cloud.google.com", "*", "*"), catalog)
    assert(gvks == Seq(Gvk("kcc.cnrm.cloud.google.com", "v1alpha1", "KCCResource")))
  }

  test("non-glob rule expands to its own singleton without discovery") {
    var touched = false
    def lazyCatalog: Seq[CatalogResource] = { touched = true; catalog }
    val Right(gvks) = expandRule(ResourceRule("apps", "v1", "Deployment"), lazyCatalog)
    assert(gvks == Seq(Gvk("apps", "v1", "Deployment")))
    assert(!touched, "C5: discovery only consulted for glob rules")
  }

  test("needsDiscovery only when a rule globs") {
    assert(!needsDiscovery(Seq(ResourceRule("apps", "v1", "Deployment"))))
    assert(needsDiscovery(Seq(ResourceRule("*.cnrm.cloud.google.com", "*", "*"))))
  }

  test("expandAll accumulates errors, keeps valid rules") {
    val (gvks, errs) = expandAll(Seq(
      ResourceRule("*.bad.example", "*", "*"),
      ResourceRule("apps", "v1", "Deployment")), catalog)
    assert(gvks == Seq(Gvk("apps", "v1", "Deployment")))
    assert(errs.size == 1)
  }

  // ---- C3: per-syncer discovery source selection -------------------- //

  private val remoteCat = Seq(
    CatalogResource("kcc.cnrm.cloud.google.com", "v9", "RemoteOnly", "remoteonlies", Seq("list")))
  private def remotes(ns: String, secret: String): Option[Seq[CatalogResource]] =
    if (ns == "ns1" && secret == "sec1") Some(remoteCat) else None

  private val globRule = ResourceRule("kcc.cnrm.cloud.google.com", "*", "*")

  test("C3: push syncer discovers against the local catalog") {
    val s = graft.model.SyncerConfig("p", mode = "push", rules = Seq(globRule))
    assert(selectCatalog(s, catalog, remotes) == Right(catalog))
    val (gvks, errs) = expandSyncer(s, catalog, remotes)
    assert(errs.isEmpty)
    assert(gvks == Seq(Gvk("kcc.cnrm.cloud.google.com", "v1alpha1", "KCCResource")))
  }

  test("C3: pull syncer discovers against its remote's catalog") {
    val s = graft.model.SyncerConfig("q", mode = "pull",
      namespace = "ns1", remoteSecret = "sec1", rules = Seq(globRule))
    val (gvks, errs) = expandSyncer(s, catalog, remotes)
    assert(errs.isEmpty)
    assert(gvks == Seq(Gvk("kcc.cnrm.cloud.google.com", "v9", "RemoteOnly")),
      "pull expansion must see the remote catalog, not the local one")
  }

  test("C3: pull syncer without a remote errors with the reference message") {
    val s = graft.model.SyncerConfig("r", mode = "pull", rules = Seq(globRule))
    assert(selectCatalog(s, catalog, remotes) ==
      Left("remote cluster config missing for Pull mode"))
    val (gvks, errs) = expandSyncer(s, catalog, remotes)
    assert(gvks.isEmpty && errs == Seq("remote cluster config missing for Pull mode"))
  }

  test("C3: missing secret surfaces as an error; no-glob pull needs no remote") {
    val bad = graft.model.SyncerConfig("s", mode = "pull",
      namespace = "ns9", remoteSecret = "nope", rules = Seq(globRule))
    assert(expandSyncer(bad, catalog, remotes)._2.exists(_.contains("does not exist")))
    // a pull syncer with only concrete rules never touches discovery (C5)
    val concrete = graft.model.SyncerConfig("t", mode = "pull",
      rules = Seq(ResourceRule("apps", "v1", "Deployment")))
    val (gvks, errs) = expandSyncer(concrete,
      sys.error("local catalog must not be forced"), (_, _) => None)
    assert(errs.isEmpty && gvks == Seq(Gvk("apps", "v1", "Deployment")))
  }
}
