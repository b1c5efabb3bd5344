package graft.streaming

import graft.SparkSpec
import graft.model.{ResourceRule, SyncerConfig}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The reference's 7 golden integration cases driven END-TO-END through
  * the STREAMING sync path — `SyncStream.start` micro-batches, events
  * arriving as CDC across more than one batch, destinations read back
  * from the committed [[ParquetDest]] snapshots. GoldenCasesSpec
  * asserts the same matrix against the batch operators; this closes
  * the gap between "the operators pass the cases" and "the streaming
  * pipeline passes the cases" (same semantics matrix, same expected
  * outputs — reference syncer/integration/krmsyncer_test.go:129-269).
  */
class GoldenCasesStreamSpec extends SparkSpec {
  import spark.implicits._
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val fullSpec = Map("foo" -> "initial-value", "resourceID" -> "generated-id")
  private val fullStatus = Map("bar" -> "initial-status")

  /** The integration corpus's 3 objects as (group, version, kind, ns,
    * name) CDC identities; payloads are attached in the stream
    * projection. */
  private val objects = Seq(
    ("e2e.gkelabs.io", "v1alpha1", "TestCRD", "default", "integration-test"),
    ("kcc.cnrm.cloud.google.com", "v1alpha1", "KCCResource", "default", "test-pull-glob"),
    ("fake.cnrm.cloud.google.com", "v1beta1", "FakeObject", "default", "glob-test"))

  /** Run one case through a live streaming query: the corpus arrives as
    * upsert events split across TWO micro-batches (objects 1-2, then 3),
    * plus any `tail` batches of raw (kind-identity + spec + op) events.
    * Returns name → (spec, status) parsed from the committed
    * destination snapshot. */
  private def runStreamCase(configs: Seq[SyncerConfig], watcherMode: String,
      tail: Seq[Seq[(String, String, String, String, String, String, String)]] = Nil)
      : Map[String, (Option[Map[String, Any]], Option[Map[String, Any]])] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, String, String, String, String, String)]
    val events = mem.toDF()
      .toDF("apiGroup", "apiVersion", "kind", "namespace", "name", "specJson", "op")
      .selectExpr("apiGroup", "apiVersion", "kind", "namespace", "name",
        "map('app','it') AS labels",
        "cast(null as map<string,string>) AS annotations",
        "specJson AS spec",
        """'{"bar":"initial-status"}' AS status""",
        "'rv-123' AS resourceVersion", "'uid-456' AS uid",
        "cast(7 as long) AS generation",
        """'[{"manager":"kubectl"}]' AS managedFields""", "op")
    val destDir = graft.Staging.dirFor("golden-stream-dest")
    val ckpt = graft.Staging.dirFor("golden-stream-ckpt")
    val q = SyncStream.start(spark, events, () => configs, destDir,
      watcherMode, ckpt)
    val payload = """{"foo":"initial-value","resourceID":"generated-id"}"""
    try {
      // CDC across micro-batches: first two objects, then the third
      objects.take(2).foreach { case (g, v, k, ns, n) =>
        mem.addData((g, v, k, ns, n, payload, "upsert")) }
      q.processAllAvailable()
      objects.drop(2).foreach { case (g, v, k, ns, n) =>
        mem.addData((g, v, k, ns, n, payload, "upsert")) }
      q.processAllAvailable()
      tail.foreach { batch =>
        mem.addData(batch: _*); q.processAllAvailable()
      }
    } finally q.stop()
    ParquetDest.read(spark, destDir).collect().map { r =>
      def parse(s: String): Option[Map[String, Any]] =
        Option(s).map(j => mapper.readValue(j, classOf[java.util.Map[String, Any]]))
          .map(m => scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toMap)
      r.getAs[String]("name") ->
        (parse(r.getAs[String]("spec")), parse(r.getAs[String]("status")))
    }.toMap
  }

  test("streaming case basic: default syncFields → status only") {
    val out = runStreamCase(Seq(SyncerConfig("basic", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD")))), "push")
    assert(out.keySet == Set("integration-test"))
    assert(out("integration-test") == (None, Some(fullStatus)))
  }

  test("streaming case spec: full payload, then CDC update + tombstone through live batches") {
    val update = ("e2e.gkelabs.io", "v1alpha1", "TestCRD", "default",
      "integration-test", """{"foo":"updated-value"}""", "upsert")
    val tombstone = ("e2e.gkelabs.io", "v1alpha1", "TestCRD", "default",
      "integration-test", null.asInstanceOf[String], "delete")
    val afterUpdate = runStreamCase(Seq(SyncerConfig("spec", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status"))))), "push",
      tail = Seq(Seq(update)))
    // the D12 merge is SSA-equivalent: the update's fields win, fields
    // it does not mention (resourceID) survive from the earlier state
    assert(afterUpdate("integration-test") ==
      (Some(Map("foo" -> "updated-value", "resourceID" -> "generated-id")),
        Some(fullStatus)),
      "a later CDC batch must supersede the earlier state field-wise")
    val afterDelete = runStreamCase(Seq(SyncerConfig("spec", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status"))))), "push",
      tail = Seq(Seq(update), Seq(tombstone)))
    assert(afterDelete.isEmpty, "a tombstone batch must delete downstream")
  }

  test("streaming case resourceid: partial spec projection") {
    val out = runStreamCase(Seq(SyncerConfig("resourceid", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec.resourceID", "status"))))), "push")
    assert(out("integration-test") ==
      (Some(Map("resourceID" -> "generated-id")), Some(fullStatus)))
  }

  test("streaming case glob: KCC glob matches both KCC-suffixed objects, not TestCRD") {
    val out = runStreamCase(Seq(SyncerConfig("glob", mode = "push",
      rules = Seq(ResourceRule("*.cnrm.cloud.google.com", "*", "*")))), "push")
    assert(out.keySet == Set("test-pull-glob", "glob-test"))
    assert(out("test-pull-glob") == (None, Some(fullStatus)))
    assert(out("glob-test") == (None, Some(fullStatus)))
  }

  test("streaming case pull: pull-mode rule syncs via the pull watcher") {
    val out = runStreamCase(Seq(SyncerConfig("pull", mode = "pull",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status"))))), "pull")
    assert(out("integration-test") == (Some(fullSpec), Some(fullStatus)))
  }

  test("streaming case pull-glob: namespace filter + spec-only projection") {
    val out = runStreamCase(Seq(SyncerConfig("pull-glob", mode = "pull",
      rules = Seq(ResourceRule("*.cnrm.cloud.google.com", "*", "*",
        namespaces = Seq("default"), syncFields = Seq("spec"))))), "pull")
    assert(out.keySet == Set("test-pull-glob", "glob-test"))
    assert(out("test-pull-glob") == (Some(fullSpec), None))
    // namespace not in the list → nothing committed at all
    val out2 = runStreamCase(Seq(SyncerConfig("pull-glob2", mode = "pull",
      rules = Seq(ResourceRule("*.cnrm.cloud.google.com", "*", "*",
        namespaces = Seq("other-ns"), syncFields = Seq("spec"))))), "pull")
    assert(out2.isEmpty)
  }

  test("streaming case suspend: live batches run, nothing is ever committed") {
    val out = runStreamCase(Seq(SyncerConfig("suspend", mode = "push",
      suspend = true,
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD")))), "push")
    assert(out.isEmpty, "suspended syncer must commit no destination state")
  }

  test("streaming mode mismatch: pull rule does not fire on push watcher") {
    val out = runStreamCase(Seq(SyncerConfig("pull-rule", mode = "pull",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD")))), "push")
    assert(out.isEmpty)
  }
}
