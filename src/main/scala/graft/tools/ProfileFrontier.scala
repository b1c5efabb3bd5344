package graft.tools

import graft.Tables
import graft.ops.NnDescent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the indexed graph walk's frontier-size cutover
  * ([[NnDescent.DefaultFrontierCutover]]): the same walk served with
  * per-hop literal `c IN` pruning (cutover = ∞) vs the broadcast
  * semi-join form (cutover = 0) at growing standing-query batch sizes
  * — the measurement behind the SCALING crossover note. Results are
  * row-identical by construction (GraphSearchSpec); this tool measures
  * WALL only.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.tools.ProfileFrontier [batchSizes...]
  */
object ProfileFrontier {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(50, 500, 2000)
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
      .persist()
    val n = corpus.count()
    println(s"[frontier] corpus $n nodes")
    val g = NnDescent.knnGraph(corpus, k = 5, iters = 2, sample = 10)
    val path = graft.Staging.dirFor("frontier-ab")
    NnDescent.writeGraphIndex(g, path)
    def run(batch: Int, cutover: Int): Double = {
      // standing queries = a deterministic slice of the corpus itself
      val qs = corpus.filter(col("id") % lit(math.max(1, n / batch)) === 0)
        .limit(batch)
        .select(col("id").as("qid"), col("vec").as("qvec"))
        .persist()
      qs.count()
      val t0 = System.nanoTime()
      val out = NnDescent.searchGraphIndexed(spark, path, corpus, qs,
        k = 10, entries = 32, beam = 10, hops = 4,
        frontierCutover = cutover)
      val cnt = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      qs.unpersist()
      println(f"[frontier] batch=$batch cutover=$cutover rows=$cnt wall=$sec%.2f s")
      sec
    }
    sizes.foreach { b =>
      run(b, Int.MaxValue) // warm
      val lit1 = run(b, Int.MaxValue)
      val join1 = run(b, 0)
      val lit2 = run(b, Int.MaxValue)
      val join2 = run(b, 0)
      println(f"[frontier] RESULT batch=$b literal=${math.min(lit1, lit2)}%.2f " +
        f"semijoin=${math.min(join1, join2)}%.2f")
    }
    spark.stop()
  }
}
