package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the cluster-dedup DAG (`dedup_cluster` /
  * `corpus_curation_neardup` bench queries): times signatures, banding,
  * star edges, Hamming verify, and each components-loop iteration
  * separately, to direct optimization at the stage that actually
  * dominates rather than the one that looks busiest in the code.
  */
object ProfileCluster {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    val bits = 60
    val bands = 4
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1

    (1 to 3).foreach { run =>
      var t0 = System.nanoTime()
      def lap(label: String, n: Long): Unit = {
        println(f"[cluster] run $run $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows $n)")
        t0 = System.nanoTime()
      }
      val sigs = Dedup.simhashSignatures(docs, "doc_id", "text",
        Dedup.md5TokenHash60, bits).persist()
      lap("signatures", sigs.count())

      val banded = sigs.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("sig"), b * bandBits).bitwiseAND(mask)): _*)))
        .toDF("id", "band", "bucket")
      val star = Dedup.starEdges(banded).persist()
      lap("star", star.count())

      val verified = star
        .join(sigs.toDF("id", "sigA"), Seq("id"))
        .join(sigs.toDF("root", "sigB"), Seq("root"))
        .filter(Dedup.hamming(col("sigA"), col("sigB")) <= 3)
        .select(col("id"), col("root")).persist()
      lap("verify", verified.count())

      val comps = Dedup.componentsFromStar(
        docs.select(col("doc_id").as("id")).distinct(), verified)
      lap("components", comps.count())
      sigs.unpersist(false); star.unpersist(false); verified.unpersist(false)
    }
    spark.stop()
  }
}
