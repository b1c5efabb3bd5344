package graft.ops

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan evidence for operator INTERNALS the final query plans no longer
  * show (localCheckpoint truncates lineage): dumps the NN-Descent
  * sweep's own physical plan to `plans/<tag>/nnd_sweep_<suffix>.txt` —
  * the round-21 optimization round's before/after exhibit for the
  * sweep-shape claims (exchange count, no self-join).
  *
  * Usage: PlanProbes <tag> <suffix>
  */
object PlanProbes {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: PlanProbes <tag> <suffix>")
    val tag = args(0); val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val g0 = NnDescent.knnGraph(corpus, k = 5, iters = 1, sample = 10)
    val swept = NnDescent.sweep(g0, corpus, 5, 10, "nnd")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve(s"nnd_sweep_$suffix.txt"),
      swept.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println("[plans] wrote nnd_sweep")
    spark.stop()
  }
}
