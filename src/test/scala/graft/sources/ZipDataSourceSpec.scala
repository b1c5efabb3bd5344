package graft.sources

import graft.SparkSpec
import graft.sinks.ZipSink
import org.apache.spark.sql.functions._

/** The graft-zip DSv2 source must round-trip what ZipSink wrote, split
  * one partition per archive, and push column pruning into the reader.
  */
class ZipDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeShardedFixture(): (String, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("zipsrc").toFile.getAbsolutePath
    val df = (1 to 200).map(i => (s"ns$i/doc$i.yaml", s"id: $i\n")).toDF("path", "data")
      .repartition(4)
    val n = ZipSink.writeSharded(df, dir)
    assert(n == 200)
    (dir, new java.io.File(dir).listFiles().count(_.getName.endsWith(".zip")))
  }

  test("round-trips a sharded export, one partition per archive") {
    val (dir, nZips) = writeShardedFixture()
    val back = spark.read.format("graft-zip").load(dir)
    assert(back.rdd.getNumPartitions == nZips, "one input partition per archive")
    val rows = back.collect()
    assert(rows.length == 200)
    val byPath = rows.map(r => r.getAs[String]("path") -> r.getAs[String]("data")).toMap
    assert(byPath("ns7/doc7.yaml") == "id: 7\n")
    assert(rows.forall(_.getAs[String]("archive").endsWith(".zip")))
  }

  test("reads a single archive file written by the parity sink") {
    val dir = java.nio.file.Files.createTempDirectory("zipone").toFile
    val zip = new java.io.File(dir, "out.zip").getAbsolutePath
    ZipSink.writeSingle(Seq(("a/b.yaml", "kind: B\n")).toDF("path", "data"), zip)
    val got = spark.read.format("graft-zip").load(zip)
      .select("path", "data").as[(String, String)].collect()
    assert(got.toSeq == Seq(("a/b.yaml", "kind: B\n")))
  }

  test("column pruning reaches the reader (path-only scan reads no data)") {
    val (dir, _) = writeShardedFixture()
    val pruned = spark.read.format("graft-zip").load(dir).select("path")
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("columns [path]"),
      s"pruned schema must reach the Scan description:\n$scanDesc")
    assert(pruned.count() == 200)
  }

  test("path-prefix filter prunes whole archives before they are opened") {
    val dir = java.nio.file.Files.createTempDirectory("zippart").toFile.getAbsolutePath
    val df = (1 to 60).map { i =>
      val ns = s"ns${i % 3}" // three first segments → three archive groups
      (s"$ns/doc$i.yaml", s"id: $i\n")
    }.toDF("path", "data")
    val n = ZipSink.writePartitionedByPrefix(df, dir)
    assert(n == 60)
    val zips = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip"))
    assert(zips.forall(_.getName.startsWith("prefix=")), "layout encodes the segment")
    val ns1Zips = zips.count(_.getName.startsWith("prefix=ns1."))
    assert(ns1Zips >= 1)

    val q = spark.read.format("graft-zip").load(dir)
      .filter(col("path").startsWith("ns1/"))
    // Pushdown must reach the scan: description advertises the filter
    // and the post-pruning archive count.
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("StringStartsWith(path,ns1/)"),
      s"path filter must be pushed to the scan:\n$desc")
    assert(desc.contains(s"archives $ns1Zips/${zips.length} after pruning"),
      s"non-matching archives must be pruned from the plan:\n$desc")

    // The probe: only ns1's archives are ever OPENED.
    ZipDataSource.openedArchives.set(0L)
    val rows = q.select("path", "data").as[(String, String)].collect()
    assert(ZipDataSource.openedArchives.get() == ns1Zips,
      s"opened ${ZipDataSource.openedArchives.get()} archives, expected $ns1Zips")
    assert(rows.length == 20 && rows.forall(_._1.startsWith("ns1/")))
    assert(rows.toMap.apply("ns1/doc1.yaml") == "id: 1\n")
  }

  test("archive-name filters prune without the prefix layout; unprunable filters keep all") {
    val (dir, nZips) = writeShardedFixture()
    val one = ZipDataSource.archivesUnder(dir).head
    ZipDataSource.openedArchives.set(0L)
    val got = spark.read.format("graft-zip").load(dir)
      .filter(col("archive") === one).count()
    assert(ZipDataSource.openedArchives.get() == 1, "equality on archive opens exactly one")
    assert(got > 0)
    // A path filter over plain sharded archives (no prefix= invariant)
    // must NOT prune — conservative keep, row results unchanged.
    val all = spark.read.format("graft-zip").load(dir)
      .filter(col("path").startsWith("ns7/")).collect()
    assert(all.map(_.getAs[String]("path")).toSeq == Seq("ns7/doc7.yaml"))
  }

  test("composes with SQL over the export output") {
    val (dir, _) = writeShardedFixture()
    spark.read.format("graft-zip").load(dir).createOrReplaceTempView("export_entries")
    val n = spark.sql(
      "SELECT count(*) FROM export_entries WHERE path LIKE 'ns1%'").head().getLong(0)
    // ns1, ns10..ns19, ns100..ns199: 1 + 10 + 100
    assert(n == 111)
  }
}
