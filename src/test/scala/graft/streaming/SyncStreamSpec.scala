package graft.streaming

import graft.SparkSpec
import graft.model.{KrmModel, ResourceRule, SyncerConfig}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Structured-Streaming sync pipeline: micro-batched change events
  * merged into a parquet destination, config re-read per batch,
  * suspend/status registry (C6/C10/C11).
  */
class SyncStreamSpec extends SparkSpec {

  private val schema = StructType(KrmModel.krmSchema.map(f => f.copy()))

  private def doc(kind: String, name: String, spec: String, status: String,
      op: String = "upsert"): Row =
    Row("e2e.gkelabs.io", "v1alpha1", kind, "default", name,
      Map.empty[String, String], Map.empty[String, String], spec, status,
      "rv", "uid", 1L, null, op)

  test("streaming: upserts then tombstone, config re-read per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, String, String, String)]
    val events = mem.toDF().toDF("kind", "name", "spec", "status", "op")
      .selectExpr("'e2e.gkelabs.io' AS apiGroup", "'v1alpha1' AS apiVersion",
        "kind", "'default' AS namespace", "name",
        "map('k','v') AS labels", "cast(null as map<string,string>) AS annotations",
        "spec", "status", "'rv' AS resourceVersion", "'uid' AS uid",
        "cast(1 as long) AS generation", "cast(null as string) AS managedFields", "op")

    @volatile var configs = Seq(SyncerConfig("s1", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status")))))

    val destDir = java.nio.file.Files.createTempDirectory("syncdest").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("syncckpt").toFile.getAbsolutePath
    val q = SyncStream.start(spark, events, () => configs, destDir, "push", ckpt)
    try {
      mem.addData(("TestCRD", "a", """{"x":1}""", """{"s":"ok"}""", "upsert"),
        ("TestCRD", "b", """{"x":2}""", null, "upsert"),
        ("Other", "c", """{"x":3}""", null, "upsert")) // no rule for Other
      q.processAllAvailable()
      val s1 = ParquetDest.read(spark, destDir).collect()
      assert(s1.map(_.getAs[String]("name")).toSet == Set("a", "b"))

      // update + tombstone in a second batch
      mem.addData(("TestCRD", "a", """{"x":9}""", null, "upsert"),
        ("TestCRD", "b", null, null, "delete"))
      q.processAllAvailable()
      val s2 = ParquetDest.read(spark, destDir).collect()
      assert(s2.map(_.getAs[String]("name")).toSet == Set("a"))
      assert(s2.head.getAs[String]("spec") == """{"x":9}""")
      // D13: status survives an upsert that doesn't project status
      assert(s2.head.getAs[String]("status") == """{"s":"ok"}""")

      // config change takes effect on the next batch without restart
      configs = Seq(SyncerConfig("s1", mode = "push", suspend = true,
        rules = configs.head.rules))
      mem.addData(("TestCRD", "d", """{"x":4}""", null, "upsert"))
      q.processAllAvailable()
      val s3 = ParquetDest.read(spark, destDir).collect()
      assert(s3.map(_.getAs[String]("name")).toSet == Set("a"), "suspended syncer adds nothing")
    } finally q.stop()
  }

  test("restart from checkpoint resumes cleanly; replayed events merge idempotently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, String, String, String)]
    def eventsDf = mem.toDF().toDF("kind", "name", "spec", "status", "op")
      .selectExpr("'e2e.gkelabs.io' AS apiGroup", "'v1alpha1' AS apiVersion",
        "kind", "'default' AS namespace", "name",
        "map('k','v') AS labels", "cast(null as map<string,string>) AS annotations",
        "spec", "status", "'rv' AS resourceVersion", "'uid' AS uid",
        "cast(1 as long) AS generation", "cast(null as string) AS managedFields", "op")
    val configs = Seq(SyncerConfig("s1", mode = "push",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
        syncFields = Seq("spec", "status")))))
    val destDir = java.nio.file.Files.createTempDirectory("restartdest").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("restartckpt").toFile.getAbsolutePath

    val q1 = SyncStream.start(spark, eventsDf, () => configs, destDir, "push", ckpt)
    try {
      mem.addData(("TestCRD", "a", """{"x":1}""", null, "upsert"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(ParquetDest.read(spark, destDir).collect()
      .map(_.getAs[String]("name")).toSet == Set("a"))

    // Second incarnation, SAME checkpoint + destination: committed
    // offsets must not be reprocessed, new data must flow, and an
    // at-least-once REPLAY of the first event must be a no-op through
    // the idempotent merge (same destination row, not a duplicate).
    val q2 = SyncStream.start(spark, eventsDf, () => configs, destDir, "push", ckpt)
    try {
      mem.addData(("TestCRD", "a", """{"x":1}""", null, "upsert"), // replay
        ("TestCRD", "b", """{"x":2}""", null, "upsert"))
      q2.processAllAvailable()
    } finally q2.stop()
    val snap = ParquetDest.read(spark, destDir).collect()
    assert(snap.length == 2, s"exactly one row per key after replay: ${snap.toSeq}")
    assert(snap.map(_.getAs[String]("name")).toSet == Set("a", "b"))
    assert(snap.find(_.getAs[String]("name") == "a").get
      .getAs[String]("spec") == """{"x":1}""")
  }

  test("query registry: dedup, suspend, status table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reg = new QueryRegistry
    val mem = MemoryStream[Int]
    var starts = 0
    def mkQuery() = {
      starts += 1
      mem.toDF().writeStream.format("noop").start()
    }
    val q1 = reg.startIfAbsent("gvk/TestCRD")(() => mkQuery())
    val q2 = reg.startIfAbsent("gvk/TestCRD")(() => mkQuery())
    assert(starts == 1, "C6: one watcher per source key")
    assert(q1 eq q2)
    assert(reg.condition("gvk/TestCRD").exists(_.condType == "Active"))
    reg.suspend("gvk/TestCRD")
    assert(reg.activeKeys.isEmpty)
    assert(reg.condition("gvk/TestCRD").exists(_.condType == "Suspended"))
    val status = reg.statusTable(spark).collect()
    assert(status.length == 1 && status.head.getAs[String]("type") == "Suspended")
    reg.stopAll()
  }
}
