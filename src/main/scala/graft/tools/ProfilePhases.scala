package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level wall breakdown for the graph-ANN serving chain — the
  * round-21 optimization round's measurement harness: times each phase
  * of `ann_graph_search_indexed` (rank/init, sweep1, sweep2, index
  * write, walk) and counts Spark JOBS per phase, so the optimization
  * targets the measured wall, not the suspected one (guide §1).
  *
  * Usage: ProfilePhases [sfDir]
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs.get; val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200)
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get - j0}")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

    (1 to 2).foreach { rnd =>
      println(s"--- round $rnd ---")
      val init = phase("init (rank+jump+score+topk)") {
        val i = NnDescent.randomInit(corpus, 5, "nnd")
          .join(corpus.select(col("id"), col("vec")), Seq("id"))
          .join(corpus.select(col("id").as("nbr"), col("vec").as("nvec")), Seq("nbr"))
          .select(col("id"), col("nbr"),
            round(Similarity.cosine(col("vec"), col("nvec")), 4).as("score"))
        Skew.saltedTopK(i, Seq("id"),
            Seq(col("score").desc, col("nbr").asc), 5, saltBy = col("nbr"))
          .select(col("id"), col("nbr"), col("score"), col("rank"))
          .localCheckpoint()
      }
      val s1 = phase("sweep 1") {
        NnDescent.sweep(init, corpus, 5, 10, "nnd").localCheckpoint()
      }
      val g = phase("sweep 2") {
        NnDescent.sweep(s1, corpus, 5, 10, "nnd").localCheckpoint()
      }
      val path = graft.Staging.dirFor("profile-phases-graph")
      phase("writeGraphIndex") {
        NnDescent.writeGraphIndex(g, path)
      }
      val res = phase("indexed walk (3 hops)") {
        val r = NnDescent.searchGraphIndexed(spark, path, corpus, queries,
          k = 10, entries = 3, beam = 5, hops = 3, seed = "nnd")
          .orderBy(col("qid"), col("rank"))
        r.write.format("noop").mode("overwrite").save()
        r
      }
      val _ = res
    }
    spark.stop()
  }
}
