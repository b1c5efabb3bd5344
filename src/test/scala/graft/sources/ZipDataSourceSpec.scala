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

  test("composes with SQL over the export output") {
    val (dir, _) = writeShardedFixture()
    spark.read.format("graft-zip").load(dir).createOrReplaceTempView("export_entries")
    val n = spark.sql(
      "SELECT count(*) FROM export_entries WHERE path LIKE 'ns1%'").head().getLong(0)
    // ns1, ns10..ns19, ns100..ns199: 1 + 10 + 100
    assert(n == 111)
  }
}
