package graft.streaming

import graft.SparkSpec
import graft.model.{KrmModel, ResourceRule, SyncerConfig, WatcherId}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** D8 per-syncer destination routing, D5 multi-remote watcher identity,
  * D14 sync-path error side-output, and the partition-scoped incremental
  * destination merge.
  */
class SyncRoutingSpec extends SparkSpec {

  private val schema = StructType(KrmModel.krmSchema.filterNot(_.name == "op")
    .map(f => f.copy()) :+ StructField("op", StringType))

  private def doc(group: String, kind: String, name: String,
      spec: String = """{"x":1}""", status: String = """{"s":"ok"}""",
      op: String = "upsert", ns: String = "default"): Row =
    Row(group, "v1alpha1", kind, ns, name, Map("app" -> "t"),
      Map.empty[String, String], spec, status, "rv", "uid", 1L, null, op)

  private def df(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private def syncerA = SyncerConfig("sync-a", mode = "push",
    namespace = "ns-a", remoteSecret = "kubeconfig-a",
    rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "KindA",
      syncFields = Seq("spec", "status"))))
  private def syncerB = SyncerConfig("sync-b", mode = "push",
    namespace = "ns-b", remoteSecret = "kubeconfig-b",
    rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "KindB",
      syncFields = Seq("spec", "status"))))

  test("D8: two push syncers route to two disjoint destinations") {
    val events = df(
      doc("e2e.gkelabs.io", "KindA", "a1"),
      doc("e2e.gkelabs.io", "KindA", "a2"),
      doc("e2e.gkelabs.io", "KindB", "b1"),
      doc("e2e.gkelabs.io", "KindC", "c1")) // matches no rule
    val configs = Seq(syncerA, syncerB)
    val watcher = WatcherId("push")
    assert(SyncStream.destKeys(configs, watcher) ==
      Seq("remote:ns-a/kubeconfig-a", "remote:ns-b/kubeconfig-b"))

    val (merged, errors) = SyncStream.applyBatchRouted(
      events, configs, _ => ParquetDest.empty(spark), watcher)
    assert(errors.count() == 0)
    val aNames = merged("remote:ns-a/kubeconfig-a").collect().map(_.getAs[String]("name")).toSet
    val bNames = merged("remote:ns-b/kubeconfig-b").collect().map(_.getAs[String]("name")).toSet
    assert(aNames == Set("a1", "a2"), "syncer A's destination gets only KindA")
    assert(bNames == Set("b1"), "syncer B's destination gets only KindB")

    // replay against the merged snapshots → identical state per destination
    val (replayed, _) = SyncStream.applyBatchRouted(events, configs, merged(_), watcher)
    assert(replayed("remote:ns-a/kubeconfig-a").collect().toSet ==
      merged("remote:ns-a/kubeconfig-a").collect().toSet)
    assert(replayed("remote:ns-b/kubeconfig-b").collect().toSet ==
      merged("remote:ns-b/kubeconfig-b").collect().toSet)
  }

  test("D8: pull syncers route to the local destination") {
    val pull = SyncerConfig("sync-local", mode = "pull",
      namespace = "ns-a", remoteSecret = "kubeconfig-a",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "KindA")))
    assert(pull.destKey == SyncerConfig.LocalDest)
    assert(SyncStream.destKeys(Seq(pull), WatcherId("pull")) == Seq("local"))
  }

  test("D5: pull rules apply only to their remote's watcher") {
    val events = df(doc("e2e.gkelabs.io", "KindA", "a1"))
    val s1 = SyncerConfig("from-r1", mode = "pull",
      namespace = "ns1", remoteSecret = "sec1",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "KindA",
        syncFields = Seq("spec"))))
    val s2 = SyncerConfig("from-r2", mode = "pull",
      namespace = "ns2", remoteSecret = "sec2",
      rules = Seq(ResourceRule("e2e.gkelabs.io", "v1alpha1", "KindA",
        syncFields = Seq("spec"))))
    val configs = Seq(s1, s2)
    val rules = graft.operators.SyncOps.rulesDF(spark, configs)

    // watcher for remote 1: only s1's rule fires
    val m1 = SyncStream.plan(events, rules, WatcherId("pull", "ns1", "sec1"))
    assert(m1.select("syncerName").collect().map(_.getString(0)).toSeq == Seq("from-r1"))
    // watcher for remote 2: only s2's rule fires
    val m2 = SyncStream.plan(events, rules, WatcherId("pull", "ns2", "sec2"))
    assert(m2.select("syncerName").collect().map(_.getString(0)).toSeq == Seq("from-r2"))
    // watcher for an unknown remote: nothing fires
    val m3 = SyncStream.plan(events, rules, WatcherId("pull", "ns9", "sec9"))
    assert(m3.count() == 0)
    // identity-less watcher (single-remote deployment): both fire
    val m0 = SyncStream.plan(events, rules, WatcherId("pull"))
    assert(m0.select("syncerName").collect().map(_.getString(0)).toSet ==
      Set("from-r1", "from-r2"))
  }

  test("D14: malformed projected payload becomes an error row; siblings merge") {
    val events = df(
      doc("e2e.gkelabs.io", "KindA", "good"),
      doc("e2e.gkelabs.io", "KindA", "bad-spec", spec = """{"x": oops"""),
      doc("e2e.gkelabs.io", "KindA", "bad-both", spec = """nope{""", status = """]["""))
    val configs = Seq(syncerA)
    val (merged, errors) = SyncStream.applyBatchRouted(
      events, configs, _ => ParquetDest.empty(spark), WatcherId("push"))

    val errRows = errors.collect().map(r =>
      r.getAs[String]("name") -> r.getAs[String]("error")).toMap
    assert(errRows == Map(
      "bad-spec" -> "malformed spec JSON",
      "bad-both" -> "malformed spec JSON; malformed status JSON"))
    assert(errors.columns.contains("syncerName"))
    // the clean sibling still merged, the poisoned rows did not
    val names = merged("remote:ns-a/kubeconfig-a").collect().map(_.getAs[String]("name")).toSet
    assert(names == Set("good"))
  }

  test("D14: a payload the rule does not project is never an error") {
    val statusOnly = syncerA.copy(rules = Seq(ResourceRule(
      "e2e.gkelabs.io", "v1alpha1", "KindA", syncFields = Seq("status"))))
    val events = df(doc("e2e.gkelabs.io", "KindA", "a1", spec = """broken{"""))
    val (merged, errors) = SyncStream.applyBatchRouted(
      events, Seq(statusOnly), _ => ParquetDest.empty(spark), WatcherId("push"))
    assert(errors.count() == 0, "unprojected spec may be malformed")
    assert(merged("remote:ns-a/kubeconfig-a").count() == 1)
  }

  test("destNamespace maps documents and tombstones into the target namespace") {
    val mapped = syncerA.copy(rules = Seq(graft.model.ResourceRule(
      "e2e.gkelabs.io", "v1alpha1", "KindA",
      syncFields = Seq("spec"), destNamespace = "mirror")))
    val events = df(doc("e2e.gkelabs.io", "KindA", "a1"))
    val (m1, _) = SyncStream.applyBatchRouted(
      events, Seq(mapped), _ => ParquetDest.empty(spark), WatcherId("push"))
    val dest = m1("remote:ns-a/kubeconfig-a")
    val row = dest.head
    assert(row.getAs[String]("namespace") == "mirror",
      "document rewritten into the mapped namespace")
    // the tombstone must chase the MAPPED key, not the source namespace
    val tomb = df(doc("e2e.gkelabs.io", "KindA", "a1", op = "delete"))
    val (m2, _) = SyncStream.applyBatchRouted(
      tomb, Seq(mapped), _ => dest, WatcherId("push"))
    assert(m2("remote:ns-a/kubeconfig-a").count() == 0, "mapped delete propagates")
    // source-namespace filtering (D7) still applies BEFORE mapping
    val filtered = mapped.copy(rules = Seq(mapped.rules.head.copy(
      namespaces = Seq("other-ns"))))
    val (m3, _) = SyncStream.applyBatchRouted(
      events, Seq(filtered), _ => ParquetDest.empty(spark), WatcherId("push"))
    assert(m3("remote:ns-a/kubeconfig-a").count() == 0)
  }

  /** (path, length, mtime) fingerprint of every data file per bucket,
    * resolved through the snapshot's manifest — "untouched" now means
    * the manifest still points at the SAME immutable generation files. */
  private def bucketFiles(dir: String): Map[String, Set[(String, Long, Long)]] =
    ParquetDest.bucketPaths(spark, dir).map { case (b, path) =>
      val d = new java.io.File(path.stripPrefix("file:"))
      s"bucket=$b" -> Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.length(), f.lastModified())).toSet
    }

  test("incremental merge rewrites only touched buckets") {
    val dir = java.nio.file.Files.createTempDirectory("incdest").toFile.getAbsolutePath
    val batch1 = df((0 until 20).map(i =>
      doc("e2e.gkelabs.io", "KindA", s"doc$i")): _*)
      .drop(KrmModel.scrubCols: _*)
    ParquetDest.mergeIncremental(spark, dir, batch1)
    val before = bucketFiles(dir)
    assert(before.size > 1, s"20 keys should span >1 of 16 buckets, got ${before.size}")
    assert(ParquetDest.read(spark, dir).count() == 20)

    // update one key → only its bucket's files may change
    val touchedBucket = spark.range(1)
      .select(pmod(xxhash64(lit("e2e.gkelabs.io"), lit("KindA"), lit("default"),
        lit("doc0")), lit(16)).cast("int")).head.getInt(0)
    val batch2 = df(doc("e2e.gkelabs.io", "KindA", "doc0", spec = """{"x":99}"""))
      .drop(KrmModel.scrubCols: _*)
    ParquetDest.mergeIncremental(spark, dir, batch2)
    val after = bucketFiles(dir)
    (before.keySet ++ after.keySet).filterNot(_ == s"bucket=$touchedBucket").foreach { b =>
      assert(after(b) == before(b), s"untouched $b was rewritten")
    }
    val snap = ParquetDest.read(spark, dir)
    assert(snap.count() == 20)
    assert(snap.filter(col("name") === "doc0").head.getAs[String]("spec")
      .contains("\"x\":99"))

    // tombstone every key in the touched bucket → bucket dir disappears,
    // everything else is untouched
    val allNames = ParquetDest.read(spark, dir)
      .withColumn("b", pmod(xxhash64(col("apiGroup"), col("kind"), col("namespace"),
        col("name")), lit(16)).cast("int"))
      .filter(col("b") === touchedBucket).select("name")
      .collect().map(_.getString(0))
    val tombs = df(allNames.map(n =>
      doc("e2e.gkelabs.io", "KindA", n, op = "delete")): _*)
      .drop(KrmModel.scrubCols: _*)
    val beforeTomb = bucketFiles(dir)
    ParquetDest.mergeIncremental(spark, dir, tombs)
    val afterTomb = bucketFiles(dir)
    assert(!afterTomb.contains(s"bucket=$touchedBucket"),
      "fully-tombstoned bucket is deleted")
    beforeTomb.keySet.filterNot(_ == s"bucket=$touchedBucket").foreach { b =>
      assert(afterTomb(b) == beforeTomb(b), s"untouched $b was rewritten")
    }
    assert(ParquetDest.read(spark, dir).count() == 20 - allNames.length)
  }

  test("failed mid-commit leaves the previous snapshot readable; next merge commits past it") {
    val dir = java.nio.file.Files.createTempDirectory("crashdest").toFile.getAbsolutePath
    val batch1 = df((0 until 10).map(i =>
      doc("e2e.gkelabs.io", "KindA", s"doc$i")): _*)
      .drop(KrmModel.scrubCols: _*)
    ParquetDest.mergeIncremental(spark, dir, batch1)
    val before = ParquetDest.read(spark, dir)
      .select("name").collect().map(_.getString(0)).toSet
    assert(before.size == 10)

    // Simulate a writer that died between staging its generation dir and
    // publishing the manifest: an orphan generation with garbage data,
    // plus an abandoned .tmp manifest. Neither is referenced by any
    // committed manifest, so neither may affect readers.
    val orphan = new java.io.File(dir, "gen-000000001-dead-crash/bucket=3")
    assert(orphan.mkdirs())
    java.nio.file.Files.write(new java.io.File(orphan, "part-00000.parquet").toPath,
      "not a parquet file".getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(dir, "_manifests/.manifest-1.tmp-dead").toPath,
      "3\tgen-000000001-dead-crash/bucket=3\n".getBytes("UTF-8"))

    val afterCrash = ParquetDest.read(spark, dir)
      .select("name").collect().map(_.getString(0)).toSet
    assert(afterCrash == before, "crash debris must be invisible to readers")

    // The next committer claims the orphan's manifest id (never written)
    // and proceeds; its generation dir name is UUID-unique so the orphan
    // cannot collide with the staging path either.
    val batch2 = df(doc("e2e.gkelabs.io", "KindA", "doc0", spec = """{"y":1}"""))
      .drop(KrmModel.scrubCols: _*)
    ParquetDest.mergeIncremental(spark, dir, batch2)
    val snap = ParquetDest.read(spark, dir)
    assert(snap.count() == 10)
    assert(snap.filter(col("name") === "doc0").head.getAs[String]("spec")
      .contains("\"y\":1"))
  }

  test("two concurrent committers both land (manifest-race retry)") {
    val dir = java.nio.file.Files.createTempDirectory("racedest").toFile.getAbsolutePath
    // Seed a snapshot so both contenders start from the same base.
    ParquetDest.mergeIncremental(spark, dir,
      df(doc("e2e.gkelabs.io", "KindA", "seed")).drop(KrmModel.scrubCols: _*))

    // Two writers with disjoint key sets race to commit the next
    // manifests. Whoever loses the single-file-rename race must retry
    // from the winner's manifest, so BOTH batches must be visible at the
    // end regardless of interleaving.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until 2).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          try {
            val batch = df((0 until 5).map(i =>
              doc("e2e.gkelabs.io", "KindA", s"w$w-doc$i")): _*)
              .drop(KrmModel.scrubCols: _*)
            start.await()
            ParquetDest.mergeIncremental(spark, dir, batch)
          } catch { case t: Throwable => failures.add(t); () }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "committers must finish")
    assert(failures.isEmpty, s"no committer may fail: ${failures.peek()}")
    val names = ParquetDest.read(spark, dir)
      .select("name").collect().map(_.getString(0)).toSet
    val expected = Set("seed") ++
      (0 until 2).flatMap(w => (0 until 5).map(i => s"w$w-doc$i"))
    assert(names == expected, s"both concurrent batches visible: $names")
  }

  test("D8 streaming: two syncers, two destination directories") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val events = mem.toDF().toDF("kind", "name")
      .selectExpr("'e2e.gkelabs.io' AS apiGroup", "'v1alpha1' AS apiVersion",
        "kind", "'default' AS namespace", "name",
        "map('k','v') AS labels", "cast(null as map<string,string>) AS annotations",
        "'{\"x\":1}' AS spec", "cast(null as string) AS status",
        "'rv' AS resourceVersion", "'uid' AS uid", "cast(1 as long) AS generation",
        "cast(null as string) AS managedFields", "'upsert' AS op")

    val root = java.nio.file.Files.createTempDirectory("routedest").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("routeckpt").toFile.getAbsolutePath
    def dirFor(key: String) = s"$root/${key.replace(':', '_').replace('/', '_')}"
    val q = SyncStream.start(spark, events, () => Seq(syncerA, syncerB),
      dirFor _, WatcherId("push"), ckpt, queryName = "routed-sync")
    try {
      mem.addData(("KindA", "a1"), ("KindB", "b1"), ("KindB", "b2"))
      q.processAllAvailable()
      val aNames = ParquetDest.read(spark, dirFor("remote:ns-a/kubeconfig-a"))
        .collect().map(_.getAs[String]("name")).toSet
      val bNames = ParquetDest.read(spark, dirFor("remote:ns-b/kubeconfig-b"))
        .collect().map(_.getAs[String]("name")).toSet
      assert(aNames == Set("a1"))
      assert(bNames == Set("b1", "b2"))
    } finally q.stop()
  }
}
