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
    (1 to 4).foreach { i =>
      val g0 = gcMillis; val j0 = jitMillis; val t0 = System.nanoTime()
      val n = Dedup.minhashSignatures(docs, "doc_id", "text").count()
      println(f"[profile] sig run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(gc ${(gcMillis - g0) / 1000.0}%.1f s, jit ${(jitMillis - j0) / 1000.0}%.1f s, rows $n)")
    }
    // Stage attribution of the LSH DAG, then the full pipeline.
    import org.apache.spark.sql.functions._
    (1 to 3).foreach { i =>
      val g0 = gcMillis; val j0 = jitMillis
      var t0 = System.nanoTime()
      val sh = Dedup.shingleHashes(docs, "doc_id", "text").persist()
      val nSh = sh.count()
      val tSh = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val banded = Dedup.bandedBuckets(sh, 64, 16).persist()
      val nB = banded.count()
      val tB = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val cands = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id1"), col("y.id").as("id2"))
      val nC = cands.count()
      val tC = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val verified = Dedup.verifyPairs(sh, cands, 0.6).count()
      val tV = (System.nanoTime() - t0) / 1e9
      banded.unpersist(false); sh.unpersist(false)
      println(f"[profile] stages run $i: shingles $tSh%.2f s ($nSh rows), " +
        f"banded $tB%.2f s ($nB rows), cands $tC%.2f s ($nC rows), " +
        f"verify $tV%.2f s ($verified pairs) " +
        f"(gc ${(gcMillis - g0) / 1000.0}%.1f s, jit ${(jitMillis - j0) / 1000.0}%.1f s)")
    }
    (1 to 3).foreach { i =>
      val g0 = gcMillis; val j0 = jitMillis; val t0 = System.nanoTime()
      val n = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.6).count()
      println(f"[profile] lsh run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(gc ${(gcMillis - g0) / 1000.0}%.1f s, jit ${(jitMillis - j0) / 1000.0}%.1f s, pairs $n)")
    }
    spark.stop()
  }
}
