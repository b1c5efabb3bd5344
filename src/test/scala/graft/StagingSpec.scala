package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Temp-dir hygiene for the artifact-materializing catalog queries
  * (`ann_ivfpq` builds an index, `b10_zip_roundtrip` a zip export): the
  * bench invokes each query ≥ 3 times per run, so per-invocation temp
  * dirs used to strand an artifact copy in /tmp per sample. All staging
  * now lives under ONE session-scoped root ([[Staging]]), reused per
  * query name and deleted on JVM exit.
  */
class StagingSpec extends SparkSpec {

  private def tmpEntries(): Set[String] =
    Files.list(Paths.get("/tmp")).iterator().asScala.map(_.getFileName.toString).toSet

  test("repeated artifact queries stage under one session root, no new /tmp dirs") {
    val before = tmpEntries()
    SparkEntry.queries("b10_zip_roundtrip")(spark, sf001).collect()
    SparkEntry.queries("b10_zip_roundtrip")(spark, sf001).collect()
    SparkEntry.queries("ann_ivfpq")(spark, sf001).collect()
    SparkEntry.queries("ann_ivfpq")(spark, sf001).collect()
    val appeared = (tmpEntries() -- before).filterNot(_.startsWith("graft-staging-"))
    // Spark itself may drop unrelated scratch (blockmgr/spark-*); only
    // the query artifacts are under test here.
    val strays = appeared.filter(n => n.contains("zip-rt") || n.contains("ivfpq"))
    assert(strays.isEmpty, s"artifact queries strayed outside the staging root: $strays")
    // one reused dir per query name under the root, not one per sample
    // (other suites share the session root — assert containment and
    // per-name uniqueness, not an exact set)
    val staged = Files.list(Staging.rootPath).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(staged.contains("ivfpq-q") && staged.contains("zip-rt"),
      s"artifact queries must stage under the session root, got $staged")
    assert(staged.count(_.startsWith("zip-rt")) == 1 &&
      staged.count(_.startsWith("ivfpq-q")) == 1,
      s"repeated runs must REUSE one dir per query name, got $staged")
  }
}
