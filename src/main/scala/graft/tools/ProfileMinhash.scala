package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** Ad-hoc repeat-profiler: same DAG executed repeatedly in one JVM with
  * GC/JIT telemetry, to separate plan cost from environment drift. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    def jitMillis: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val docs = Tables.documents(spark, sfDir)
    (1 to 6).foreach { i =>
      val g0 = gcMillis; val j0 = jitMillis; val t0 = System.nanoTime()
      val n = Dedup.minhashSignatures(docs, "doc_id", "text").count()
      println(f"[profile] sig run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(gc ${(gcMillis - g0) / 1000.0}%.1f s, jit ${(jitMillis - j0) / 1000.0}%.1f s, rows $n)")
    }
    spark.stop()
  }
}
