package graft.export

import graft.SparkSpec
import graft.functions.Yaml
import graft.operators.ExportOps
import graft.sinks.ZipSink
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.util.zip.ZipFile

/** Export pipeline: path derivation pinned by the reference's e2e
  * expectation (`_cluster/core/Namespace/default.yaml`,
  * /root/reference/pkg/export/export_test.go:111-134), zip sink
  * round-trip in both single-archive and sharded modes.
  */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("path derivation matches the reference e2e expectation") {
    // a cluster-scoped core-group Namespace object named "default"
    val df = Seq(("", "", "Namespace", "default")).toDF("ns", "grp", "kind", "name")
    val got = df.select(ExportOps.krmPath($"ns", $"grp", $"kind", $"name").as("p"))
      .head().getString(0)
    assert(got == "_cluster/core/Namespace/default.yaml")
  }

  test("verb + subresource filters") {
    val df = Seq(
      ("pods", "get,list,watch"),
      ("pods/status", "get,list"),
      ("events", "get,watch")).toDF("name", "verbs")
    val listed = ExportOps.verbFilter(df, $"verbs", "list")
    assert(listed.collect().map(_.getString(0)).toSet == Set("pods", "pods/status"))
    val main = ExportOps.subresourceFilter(listed, $"name")
    assert(main.collect().map(_.getString(0)).toSeq == Seq("pods"))
  }

  test("yaml rendering of a KRM-ish document") {
    val y = Yaml.fromJson("""{"kind":"Namespace","metadata":{"name":"default","labels":{"a":"b"}},"n":3,"ok":true}""")
    assert(y ==
      """kind: Namespace
        |metadata:
        |  name: default
        |  labels:
        |    a: b
        |n: 3
        |ok: true
        |""".stripMargin)
  }

  test("zip sink single-archive round trip") {
    val dir = java.nio.file.Files.createTempDirectory("ziptest").toFile
    val out = new java.io.File(dir, "out.zip").getAbsolutePath
    val df = Seq(("a/b/one.yaml", "kind: One\n"), ("c/two.yaml", "kind: Two\n"))
      .toDF("path", "data")
    ZipSink.writeSingle(df, out)
    val zf = new ZipFile(out)
    try {
      val names = zf.stream().map(_.getName).toArray.map(_.toString).toSet
      assert(names == Set("a/b/one.yaml", "c/two.yaml"))
      val e = zf.getEntry("a/b/one.yaml")
      val content = new String(zf.getInputStream(e).readAllBytes())
      assert(content == "kind: One\n")
    } finally zf.close()
  }

  test("zip sink sharded mode writes all entries across archives") {
    val dir = java.nio.file.Files.createTempDirectory("zipshard").toFile.getAbsolutePath
    val df = (1 to 100).map(i => (s"ns/$i.yaml", s"id: $i\n")).toDF("path", "data")
      .repartition(4)
    ZipSink.writeSharded(df, dir)
    val zips = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip"))
    assert(zips.nonEmpty)
    val names = zips.flatMap { z =>
      val zf = new ZipFile(z)
      try zf.stream().map(_.getName).toArray.map(_.toString) finally zf.close()
    }.toSet
    assert(names.size == 100)
  }

  test("end-to-end export of a KRM table directory") {
    // build a tiny KRM table dir
    val root = java.nio.file.Files.createTempDirectory("exportroot").toFile.getAbsolutePath
    val schema = StructType(Seq(
      StructField("apiGroup", StringType), StructField("namespace", StringType),
      StructField("kind", StringType), StructField("name", StringType)))
    val rows = Seq(
      Row("", "", "Namespace", "default"),
      Row("apps", "prod", "Deployment", "web"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.parquet(s"$root/objects.parquet")
    val out = java.nio.file.Files.createTempDirectory("exportout").toFile
    val zip = new java.io.File(out, "export.zip").getAbsolutePath
    val res = ExportJob.run(spark, root, zip)
    assert(res.errors.isEmpty, res.errors.mkString("; "))
    assert(res.entries == 2)
    val zf = new ZipFile(zip)
    try {
      val names = zf.stream().map(_.getName).toArray.map(_.toString).toSet
      assert(names == Set("_cluster/core/Namespace/default.yaml",
        "prod/apps/Deployment/web.yaml"))
    } finally zf.close()
  }

  test("partitioned-zip export: archives carry the namespace; reader prunes on path prefix") {
    val root = java.nio.file.Files.createTempDirectory("exportpz").toFile.getAbsolutePath
    val schema = StructType(Seq(
      StructField("apiGroup", StringType), StructField("namespace", StringType),
      StructField("kind", StringType), StructField("name", StringType)))
    val rows = Seq(
      Row("", "prod", "Pod", "a"), Row("", "prod", "Pod", "b"),
      Row("", "dev", "Pod", "c"), Row("", "", "Namespace", "prod"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.parquet(s"$root/objects.parquet")
    val out = java.nio.file.Files.createTempDirectory("exportpzout").toFile.getAbsolutePath
    val res = Main.run(spark, Main.Options(root = root, output = out, partitionedZip = true))
    assert(res.entries == 4 && res.errors.isEmpty)
    val zips = new java.io.File(out).listFiles().filter(_.getName.endsWith(".zip"))
    assert(zips.forall(_.getName.startsWith("prefix=")))
    val prodZips = zips.count(_.getName.startsWith("prefix=prod."))
    assert(prodZips >= 1)
    graft.sources.ZipDataSource.openedArchives.set(0L)
    val prod = spark.read.format("graft-zip").load(out)
      .filter($"path".startsWith("prod/")).select("path").as[String].collect()
    assert(prod.toSet == Set("prod/core/Pod/a.yaml", "prod/core/Pod/b.yaml"))
    assert(graft.sources.ZipDataSource.openedArchives.get() == prodZips,
      "only the prod namespace's archives are opened")
  }

  test("partitioned export: layout prunes by namespace/kind") {
    val root = java.nio.file.Files.createTempDirectory("exportpart").toFile.getAbsolutePath
    val schema = StructType(Seq(
      StructField("apiGroup", StringType), StructField("namespace", StringType),
      StructField("kind", StringType), StructField("name", StringType)))
    val rows = Seq(
      Row("", "prod", "Pod", "a"), Row("", "prod", "Pod", "b"),
      Row("", "dev", "Pod", "c"), Row("", "", "Namespace", "prod"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.parquet(s"$root/objects.parquet")
    val out = java.nio.file.Files.createTempDirectory("exportpartout").toFile.getAbsolutePath
    val res = ExportJob.runPartitioned(spark, root, out)
    assert(res.entries == 4 && res.errors.isEmpty)
    // partition directories exist → pruning-friendly layout
    assert(new java.io.File(s"$out/namespace=prod/kind=Pod").exists())
    assert(new java.io.File(s"$out/namespace=_cluster/kind=Namespace").exists())
    // a namespace-filtered read scans only that partition
    val pruned = spark.read.parquet(out).filter($"namespace" === "prod")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(namespace"), plan)
  }

  test("B1 CLI: flag contract matches the reference") {
    // missing --output → same message as the reference (export.go:44-47)
    assert(Main.parse(Seq("--root", "/x")) ==
      Left("required flag(s) \"output\" not set"))
    // positional args rejected (main.go:31-33)
    assert(Main.parse(Seq("extra", "--output", "o.zip"))
      .swap.exists(_.startsWith("unexpected arguments")))
    assert(Main.parse(Seq("--frobnicate")).swap.exists(_.startsWith("unknown flag")))
    assert(Main.parse(Seq("--root", "/x", "--output", "o.zip", "--sharded", "--partitioned"))
      .isLeft)
    assert(Main.parse(Seq("--root", "/x", "--output", "o.zip")) ==
      Right(Main.Options(root = "/x", output = "o.zip")))
  }

  test("B1 CLI: end-to-end dispatch through Main.run") {
    val root = java.nio.file.Files.createTempDirectory("cliroot").toFile.getAbsolutePath
    val schema = StructType(Seq(
      StructField("apiGroup", StringType), StructField("namespace", StringType),
      StructField("kind", StringType), StructField("name", StringType)))
    val rows = Seq(Row("", "", "Namespace", "default"), Row("apps", "prod", "Deployment", "web"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.parquet(s"$root/objects.parquet")

    val zip = java.nio.file.Files.createTempDirectory("cliout")
      .resolve("export.zip").toString
    val Right(opts) = Main.parse(Seq("--root", root, "--output", zip))
    val res = Main.run(spark, opts)
    assert(res.entries == 2 && res.errors.isEmpty)
    val zf = new ZipFile(zip)
    try assert(zf.size() == 2) finally zf.close()

    val pdir = java.nio.file.Files.createTempDirectory("clipart").toString
    val Right(popts) = Main.parse(Seq("--root", root, "--output", pdir, "--partitioned"))
    assert(Main.run(spark, popts).entries == 2)
    assert(new java.io.File(s"$pdir/namespace=prod").exists())
  }

  test("sink pass count equals entries without re-evaluating the plan") {
    // the UDF must run exactly once per row: a counting UDF would double
    // under the old count()-then-write shape
    val hits = spark.sparkContext.longAccumulator("udf_hits")
    val count = udf((s: String) => { hits.add(1L); s })
    val df = Seq(("p1.yaml", "a"), ("p2.yaml", "b")).toDF("path", "raw")
      .select($"path", count($"raw").as("data"))
    val out = java.nio.file.Files.createTempDirectory("onceout")
      .resolve("once.zip").toString
    val n = ZipSink.writeSingle(df, out)
    assert(n == 2)
    assert(hits.value == 2, s"UDF evaluated ${hits.value} times for 2 rows")
  }

  test("export tolerates unreadable tables (error accumulation)") {
    val root = java.nio.file.Files.createTempDirectory("exportbad").toFile
    // one good table, one corrupt file
    val schema = StructType(Seq(StructField("kind", StringType), StructField("name", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row("Pod", "p1"))), schema)
      .write.parquet(new java.io.File(root, "good.parquet").getAbsolutePath)
    java.nio.file.Files.writeString(
      new java.io.File(root, "bad.parquet").toPath, "not parquet")
    val zip = new java.io.File(root, "out.zip").getAbsolutePath
    val res = ExportJob.run(spark, root.getAbsolutePath, zip)
    assert(res.entries == 1)
    assert(res.errors.nonEmpty)
  }
}
