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
}
