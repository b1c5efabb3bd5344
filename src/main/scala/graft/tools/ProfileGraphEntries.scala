package graft.tools

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B of graph-walk ENTRY SELECTION at equal walk budget — the
  * measurement behind the cell-seeded family-table row: uniform
  * md5-rank entries vs [[graft.ops.NnDescent.searchGraphIndexedCellSeeded]]
  * (per-query entries from the committed literal quantizer's probed
  * cells), same graph, same beam, same per-query entry count, recall@10
  * as a function of the HOP budget. The question it answers is the
  * scale one: seeded entries start the walk near the query, so the
  * recall a uniform walk buys with extra hops should arrive earlier.
  *
  * Usage: ProfileGraphEntries [sfDir] [runs=3]
  */
object ProfileGraphEntries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = corpus.count()

    // the family-table graph configuration + its serving index
    val graph = NnDescent.knnGraph(corpus, k = 20, iters = 4, sample = 40)
      .persist()
    graph.count()
    val tmp = java.nio.file.Files.createTempDirectory("gentry").toFile.getAbsolutePath
    NnDescent.writeGraphIndex(graph, s"$tmp/idx")

    // the committed literal quantizer (16 cells) the SemDeDup gate and
    // the seeded serving queries share, plus a TRAINED 16-cell
    // comparison arm (real Voronoi structure instead of random
    // projections)
    val cents = Similarity.hyperplanes(dim = 64, numBits = 16, seed = 7L)
    val trained = IvfIndex.train(corpus, "id", "vec", k = 16, iters = 2,
      seed = SelectedSeeds.ivf)

    val exact = Similarity.bruteForceTopK(queries, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def measure(mk: () => DataFrame): (Double, Double) = {
      var got: Set[(Long, Long)] = Set.empty
      val walls = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        got = mk().select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (System.nanoTime() - t0) / 1e9
      }
      val timed = if (walls.length > 1) walls.tail else walls
      ((exact intersect got).size.toDouble / exact.size,
        timed.sorted.apply(timed.length / 2))
    }

    // equal per-query entry budget: 32 uniform = 4 cells × 8 nodes
    val entries = 32
    val nCells = 4
    val perCell = 8
    val beam = 10
    println(s"graph-entry A/B: sfDir=$sfDir corpus=$n build-k=20 beam=$beam " +
      s"entries=$entries vs cells=$nCells x perCell=$perCell (equal budget)")
    println("| hops | uniform recall@10 | seeded(literal) | seeded(trained) | uniform wall s | seeded(trained) wall s |")
    println("|---|---|---|---|---|---|")
    for (hops <- 0 to 4) {
      val (ru, wu) = measure(() => NnDescent.searchGraphIndexed(spark,
        s"$tmp/idx", corpus, queries, 10, entries, beam, hops))
      val (rs, _) = measure(() => NnDescent.searchGraphIndexedCellSeeded(
        spark, s"$tmp/idx", corpus, queries, 10, cents, nCells, perCell,
        beam, hops))
      val (rt, wt) = measure(() => NnDescent.searchGraphIndexedCellSeeded(
        spark, s"$tmp/idx", corpus, queries, 10, trained, nCells, perCell,
        beam, hops))
      println(f"| $hops | $ru%.3f | $rs%.3f | $rt%.3f | $wu%.2f | $wt%.2f |")
    }
    spark.stop()
  }
}
