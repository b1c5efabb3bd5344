package graft.streaming

import graft.SparkSpec
import graft.model.{KrmModel, ResourceRule, SyncerConfig}
import graft.operators.SyncOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Snapshot-diff tombstone synthesis ([[SyncOps.snapshotDiff]] +
  * [[SyncStream.startSnapshotSync]]): sources that deliver periodic
  * full snapshots instead of watch events must still propagate deletes
  * — the reference's NotFound→isDeleted re-read
  * (krmsyncer_controller.go:415-423) inferred by diffing consecutive
  * snapshots. The core parity claim: two snapshots replayed through the
  * existing merge path land on the SAME destination as the equivalent
  * CDC event stream.
  */
class SnapshotDiffSpec extends SparkSpec {

  private val schema = StructType(KrmModel.krmSchema.map(f => f.copy()))

  private def doc(name: String, spec: String, status: String = null,
      op: String = "upsert", kind: String = "TestCRD"): Row =
    Row("e2e.gkelabs.io", "v1alpha1", kind, "default", name,
      Map.empty[String, String], Map.empty[String, String], spec, status,
      "rv", "uid", 1L, null, op)

  private def df(rows: Row*): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private val configs = Seq(SyncerConfig("s1", mode = "push",
    rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "TestCRD",
      syncFields = Seq("spec", "status")))))

  test("snapshotDiff: inserts, payload changes, tombstones; unchanged keys dropped") {
    val prev = df(doc("stays", """{"x":1}"""), doc("changes", """{"x":2}"""),
      doc("vanishes", """{"x":3}"""))
    val curr = df(doc("stays", """{"x":1}"""), doc("changes", """{"x":9}"""),
      doc("appears", """{"x":4}"""))
    val events = SyncOps.snapshotDiff(prev.drop("op"), curr.drop("op"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("op")).toMap
    assert(events == Map("changes" -> "upsert", "appears" -> "upsert",
      "vanishes" -> "delete"), s"got $events")
  }

  test("snapshotDiff of a snapshot with itself is empty") {
    val s = df(doc("a", """{"x":1}"""), doc("b", null, """{"s":"ok"}"""))
    assert(SyncOps.snapshotDiff(s.drop("op"), s.drop("op")).count() == 0)
  }

  test("snapshot path ≡ CDC path through the existing merge") {
    val s1 = df(doc("stays", """{"x":1}""", """{"s":"a"}"""),
      doc("changes", """{"x":2}"""), doc("vanishes", """{"x":3}"""))
    val s2 = df(doc("stays", """{"x":1}""", """{"s":"a"}"""),
      doc("changes", """{"x":9}"""), doc("appears", """{"x":4}"""))
    // destination after snapshot 1 (both paths share it)
    val dest1 = SyncStream.applyBatch(s1, configs, ParquetDest.empty(spark), "push")
    // CDC path: the watch events a live source would have emitted for s1→s2
    val cdcEvents = df(doc("changes", """{"x":9}"""), doc("appears", """{"x":4}"""),
      doc("vanishes", null, op = "delete"))
    val viaCdc = SyncStream.applyBatch(cdcEvents, configs, dest1, "push")
    // snapshot path: infer the same events by diffing the two snapshots
    val viaSnap = SyncStream.applySnapshotBatch(
      s1.drop("op"), s2.drop("op"), configs, dest1, "push")
    val key = (r: Row) => r.getAs[String]("name")
    val a = viaCdc.collect().sortBy(key).toSeq
    val b = viaSnap.collect().sortBy(key).toSeq
    assert(a == b, s"CDC dest:\n${a.mkString("\n")}\nsnapshot dest:\n${b.mkString("\n")}")
    assert(a.map(key).toSet == Set("stays", "changes", "appears"),
      "tombstone synthesized for the vanished key")
  }

  test("streaming snapshot sync: deletes propagate, unchanged batch is a no-op") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    // each micro-batch = one FULL snapshot (name, spec)
    val snapshots = mem.toDF().toDF("name", "spec")
      .selectExpr("'e2e.gkelabs.io' AS apiGroup", "'v1alpha1' AS apiVersion",
        "'TestCRD' AS kind", "'default' AS namespace", "name",
        "cast(null as map<string,string>) AS labels",
        "cast(null as map<string,string>) AS annotations",
        "spec", "cast(null as string) AS status")
    val destDir = java.nio.file.Files.createTempDirectory("snapdest").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("snapckpt").toFile.getAbsolutePath
    val state = java.nio.file.Files.createTempDirectory("snapstate").toFile.getAbsolutePath
    val q = SyncStream.startSnapshotSync(spark, snapshots, () => configs,
      (_: String) => destDir, graft.model.WatcherId("push"), ckpt, state)
    try {
      // snapshot 1: {a, b}
      mem.addData(("a", """{"x":1}"""), ("b", """{"x":2}"""))
      q.processAllAvailable()
      assert(ParquetDest.read(spark, destDir).collect()
        .map(_.getAs[String]("name")).toSet == Set("a", "b"))
      // snapshot 2: {a (changed), c} — b vanished, must be deleted
      mem.addData(("a", """{"x":9}"""), ("c", """{"x":3}"""))
      q.processAllAvailable()
      val s2 = ParquetDest.read(spark, destDir).collect()
      assert(s2.map(_.getAs[String]("name")).toSet == Set("a", "c"),
        s"vanished key deleted: ${s2.toSeq}")
      assert(s2.find(_.getAs[String]("name") == "a").get
        .getAs[String]("spec") == """{"x":9}""")
      // snapshot 3 identical to 2: destination unchanged (diff is empty)
      val before = ParquetDest.bucketPaths(spark, destDir)
      mem.addData(("a", """{"x":9}"""), ("c", """{"x":3}"""))
      q.processAllAvailable()
      assert(ParquetDest.bucketPaths(spark, destDir) == before,
        "an unchanged snapshot must not rewrite any bucket")
    } finally q.stop()
  }
}
