package graft.tools

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NN-Descent convergence table: graph recall@k vs (sweeps × ρ-cap) on
  * BOTH fixture regimes — the near-isotropic harness embeddings (the
  * paper's hard case: weak neighbor-of-neighbor signal) and a planted
  * 8-cluster corpus (the regime the algorithm is built for) — so the
  * build configuration (`iters`, `sample`) is picked from measurement,
  * not folklore (the ProfileAnnFamilies discipline; round-15 verdict,
  * "what's missing" #3). Wall = build seconds, single run (the build is
  * ingest-time; shape, not absolute seconds, is the transferable part).
  *
  * Usage: ProfileNnDescent [sfDir]
  */
object ProfileNnDescent {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val k = 5
    def exactGraph(nodes: DataFrame): Map[Long, Set[Long]] = {
      val qs = nodes.select(col("id").as("qid"), col("vec").as("qvec"))
      Similarity.bruteForceTopK(qs, nodes, k + 1)
        .filter(col("qid") =!= col("id"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("rank"))))
        .filter(col("rk") <= k)
        .select("qid", "id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    }
    def recallOf(g: DataFrame, truth: Map[Long, Set[Long]]): Double = {
      val got = g.select("id", "nbr").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size
      }.sum / truth.size
    }

    def table(name: String, nodes: DataFrame): Unit = {
      val truth = exactGraph(nodes)
      println(s"\n$name (n=${nodes.count()}, k=$k, recall@$k of the graph itself):")
      println("| sweeps | cap=10 | cap=20 | cap=30 | wall s (cap=20) |")
      println("|---|---|---|---|---|")
      for (sweeps <- Seq(1, 2, 3, 4, 6)) {
        val cells = Seq(10, 20, 30).map { cap =>
          f"${recallOf(NnDescent.knnGraph(nodes, k, sweeps, cap), truth)}%.3f"
        }
        val t0 = System.nanoTime()
        NnDescent.knnGraph(nodes, k, sweeps, 20).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(s"| $sweeps | ${cells.mkString(" | ")} | " + f"$wall%.1f |")
      }
    }

    val iso = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    table(s"near-isotropic harness embeddings ($sfDir)", iso)

    // The OVERBUILD table — the lever that actually closes the hard
    // case: sweeps/cap saturate (above), but building a WIDER graph and
    // truncating to the serving k recovers the recall the per-node
    // top-k lists lose when the neighbor-of-neighbor signal is weak
    // (Dong §5.3's K-vs-recall trade). recall@5 of the rank≤5 slice.
    val truthIso = exactGraph(iso)
    println(s"\noverbuild-then-truncate on the same embeddings (serving k=$k):")
    println("| build k | sweeps | recall@5 | build wall s |")
    println("|---|---|---|---|")
    for (bk <- Seq(5, 10, 15, 20); sweeps <- Seq(4)) {
      val t0 = System.nanoTime()
      val g = NnDescent.knnGraph(iso, bk, sweeps, 2 * bk)
        .filter(col("rank") <= k).persist()
      g.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"| $bk | $sweeps | ${recallOf(g, truthIso)}%.3f | $wall%.1f |")
      g.unpersist()
    }

    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian()))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.08 * rnd.nextGaussian()).toFloat).toSeq)
    }
    table("planted 8-cluster corpus (NnDescentSpec fixture)",
      rows.toDF("id", "vec"))
    spark.stop()
  }
}
