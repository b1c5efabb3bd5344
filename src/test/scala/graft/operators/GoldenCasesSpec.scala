package graft.operators

import graft.SparkSpec
import graft.model.{KrmModel, ResourceRule, SyncerConfig}
import graft.streaming.SyncStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Port of the reference's golden-file integration suite
  * (/root/reference/syncer/integration/krmsyncer_test.go + the cases/
  * directory):
  * the shared 3-object corpus is pushed through the full sync data plane
  * under each case's rule config, and the destination state is compared
  * structurally (spec and status maps; objects not expected must be
  * absent) — same semantics matrix, same expected outputs (FIXTURES.md
  * §A.2).
  */
class GoldenCasesSpec extends SparkSpec {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val schema = StructType(KrmModel.krmSchema.filterNot(_.name == "op")
    .map(f => f.copy()) :+ StructField("op", StringType))

  /** The input corpus (integration/testdata/object.yaml): TestCRD,
    * KCCResource, FakeObject — shared payload spec.foo/spec.resourceID +
    * status.bar (status set via subresource). */
  private def corpus: DataFrame = {
    val rows = Seq(
      ("e2e.gkelabs.io", "v1alpha1", "TestCRD", "default", "integration-test"),
      ("kcc.cnrm.cloud.google.com", "v1alpha1", "KCCResource", "default", "test-pull-glob"),
      ("fake.cnrm.cloud.google.com", "v1beta1", "FakeObject", "default", "glob-test")
    ).map { case (g, v, k, ns, n) =>
      Row(g, v, k, ns, n, Map("app" -> "it"), Map.empty[String, String],
        """{"foo":"initial-value","resourceID":"generated-id"}""",
        """{"bar":"initial-status"}""",
        "rv-123", "uid-456", 7L, """[{"manager":"kubectl"}]""", "upsert")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  private def runCase(configs: Seq[SyncerConfig], watcherMode: String = "push"): Map[String, (Option[Map[String, Any]], Option[Map[String, Any]])] = {
    val dest = SyncStream.applyBatch(corpus, configs,
      graft.streaming.ParquetDest.empty(spark), watcherMode)
    dest.collect().map { r =>
      def parse(s: String): Option[Map[String, Any]] =
        Option(s).map(j => mapper.readValue(j, classOf[java.util.Map[String, Any]]))
          .map(m => scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toMap)
      r.getAs[String]("name") -> (parse(r.getAs[String]("spec")), parse(r.getAs[String]("status")))
    }.toMap
  }

  private val fullSpec = Map("foo" -> "initial-value", "resourceID" -> "generated-id")
  private val fullStatus = Map("bar" -> "initial-status")

  test("case basic: default syncFields → status only") {
    val out = runCase(Seq(SyncerConfig("basic", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD")))))
    assert(out.keySet == Set("integration-test"))
    assert(out("integration-test") == (None, Some(fullStatus)))
  }

  test("case spec: syncFields [spec, status] → full payload") {
    val out = runCase(Seq(SyncerConfig("spec", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status"))))))
    assert(out("integration-test") == (Some(fullSpec), Some(fullStatus)))
  }

  test("case resourceid: syncFields [spec.resourceID, status] → partial spec") {
    val out = runCase(Seq(SyncerConfig("resourceid", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec.resourceID", "status"))))))
    assert(out("integration-test") ==
      (Some(Map("resourceID" -> "generated-id")), Some(fullStatus)))
  }

  test("case glob: KCC glob matches both KCC-suffixed objects, not TestCRD") {
    val out = runCase(Seq(SyncerConfig("glob", mode = "push",
      rules = Seq(ResourceRule("*.cnrm.cloud.google.com", "*", "*")))))
    assert(out.keySet == Set("test-pull-glob", "glob-test"))
    assert(out("test-pull-glob") == (None, Some(fullStatus)))
    assert(out("glob-test") == (None, Some(fullStatus)))
  }

  test("case pull: pull-mode rule syncs via the pull watcher") {
    val out = runCase(Seq(SyncerConfig("pull", mode = "pull",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status"))))), watcherMode = "pull")
    assert(out("integration-test") == (Some(fullSpec), Some(fullStatus)))
  }

  test("case pull-glob: namespace filter + spec-only projection") {
    val out = runCase(Seq(SyncerConfig("pull-glob", mode = "pull",
      rules = Seq(ResourceRule("*.cnrm.cloud.google.com", "*", "*",
        namespaces = Seq("default"), syncFields = Seq("spec"))))), watcherMode = "pull")
    assert(out.keySet == Set("test-pull-glob", "glob-test"))
    assert(out("test-pull-glob") == (Some(fullSpec), None))
    // namespace not in the list → nothing
    val out2 = runCase(Seq(SyncerConfig("pull-glob2", mode = "pull",
      rules = Seq(ResourceRule("*.cnrm.cloud.google.com", "*", "*",
        namespaces = Seq("other-ns"), syncFields = Seq("spec"))))), watcherMode = "pull")
    assert(out2.isEmpty)
  }

  test("case suspend: nothing synced") {
    val out = runCase(Seq(SyncerConfig("suspend", mode = "push", suspend = true,
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD")))))
    assert(out.isEmpty)
  }

  test("mode mismatch: pull rule does not fire on push watcher") {
    val out = runCase(Seq(SyncerConfig("pull-rule", mode = "pull",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD")))),
      watcherMode = "push")
    assert(out.isEmpty)
  }

  test("scrub: destination never carries system metadata columns") {
    val dest = SyncStream.applyBatch(corpus,
      Seq(SyncerConfig("basic", mode = "push",
        rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD")))),
      graft.streaming.ParquetDest.empty(spark), "push")
    assert(KrmModel.scrubCols.forall(c => !dest.columns.contains(c)))
  }

  test("tombstone delete + idempotent replay") {
    val configs = Seq(SyncerConfig("basic", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status")))))
    val dest1 = SyncStream.applyBatch(corpus, configs,
      graft.streaming.ParquetDest.empty(spark), "push")
    // replay the same batch → same state (at-least-once → idempotent)
    val dest2 = SyncStream.applyBatch(corpus, configs, dest1, "push")
    assert(dest2.collect().toSet == dest1.collect().toSet)
    // tombstone for the synced object removes it
    val tomb = corpus.withColumn("op", org.apache.spark.sql.functions.lit("delete"))
    val dest3 = SyncStream.applyBatch(tomb, configs, dest2, "push")
    assert(dest3.count() == 0)
    // deleting again (NotFound) is a no-op, not an error
    val dest4 = SyncStream.applyBatch(tomb, configs, dest3, "push")
    assert(dest4.count() == 0)
  }

  test("SSA field-merge: second syncer owning status doesn't clobber spec") {
    val specOnly = Seq(SyncerConfig("spec-owner", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec")))))
    val statusOnly = Seq(SyncerConfig("status-owner", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("status")))))
    val d1 = SyncStream.applyBatch(corpus, specOnly,
      graft.streaming.ParquetDest.empty(spark), "push")
    val d2 = SyncStream.applyBatch(corpus, statusOnly, d1, "push")
    val row = d2.filter(d2("name") === "integration-test").head()
    assert(row.getAs[String]("spec") != null, "spec from first apply retained")
    assert(row.getAs[String]("status") != null, "status from second apply added")
  }
}
