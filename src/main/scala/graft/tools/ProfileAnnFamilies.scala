package graft.tools

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured recall-vs-cost comparison across EVERY ANN index family the
  * engine ships, at production-pruned configurations over the harness
  * embeddings — the table SCALING.md commits so "which index do I pick"
  * is answered by measurement, not by each family's isolated spec
  * floor. Brute force anchors recall 1.0 and the flat-scan wall; every
  * other row reports recall@10 against it plus the measured wall
  * (median of `runs`, first run discarded as JIT warm-up).
  *
  * Usage: ProfileAnnFamilies [sfDir] [runs=3]
  */
object ProfileAnnFamilies {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    val dim = 64

    // trained components (training cost is NOT in the probe wall — at
    // production all of these are ingest-time artifacts). Each k-means
    // family trains at ITS committed selected seed (SelectedSeeds, the
    // round-19 sweep protocol); IVF-SQ keeps the historical default.
    val centroids = IvfIndex.train(corpus, "id", "vec", k = 8, iters = 2,
      seed = SelectedSeeds.ivf)
    val pqCb = PqIndex.train(corpus, "id", "vec", m = 8, k = 16, iters = 2,
      seed = SelectedSeeds.pq)
    val centsIvfPq = IvfIndex.train(corpus, "id", "vec", k = 8, iters = 2,
      seed = SelectedSeeds.ivfpq)
    val pqCbIvfPq = PqIndex.train(corpus, "id", "vec", m = 8, k = 16,
      iters = 2, seed = SelectedSeeds.ivfpq)
    val centsRes = IvfIndex.train(corpus, "id", "vec", k = 8, iters = 2,
      seed = SelectedSeeds.res)
    val resCb = ResidualPq.trainCodebooks(corpus, centsRes, m = 8, k = 16,
      iters = 2, seed = SelectedSeeds.res)
    val basis = Pca.loadBasis(spark, s"${graft.Tables.fixturesDir}/pca_basis.parquet")
    val rot = Opq.rotation(basis,
      Opq.allocate(basis.sortBy(_.component).map(_.eigenvalue), 8))
    val rotated = corpus.select(col("id"),
      graft.functions.functions.rotate_project(col("vec"), rot).as("vec"))
    val centsOpq = IvfIndex.train(rotated, "id", "vec", k = 8, iters = 2,
      seed = SelectedSeeds.opq)
    val opqCb = ResidualPq.trainCodebooksRotated(corpus, rot, centsOpq,
      m = 8, k = 16, iters = 2, seed = SelectedSeeds.opq)
    val centsKm = IvfIndex.train(corpus, "id", "vec", k = 8, iters = 2)
    val sqB = Sq.train(corpus, "vec")
    val ivfSqB = IvfSq.trainBounds(corpus, centsKm)
    val tmp = java.nio.file.Files.createTempDirectory("annfam").toFile.getAbsolutePath
    IvfPq.writeIndex(corpus, centsIvfPq, pqCbIvfPq, s"$tmp/ivfpq")
    ResidualPq.writeIndex(corpus, centsRes, resCb, s"$tmp/res")
    ResidualPq.writeIndexRotated(corpus, rot, centsOpq, opqCb, s"$tmp/opq")
    IvfSq.writeIndex(corpus, centsKm, ivfSqB, s"$tmp/ivfsq")

    val exact = Similarity.bruteForceTopK(queries, corpus, 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def measure(label: String, mk: () => DataFrame): Unit = {
      var got: Set[(Long, Long)] = Set.empty
      val walls = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        got = mk().select("qid", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (System.nanoTime() - t0) / 1e9
      }
      val timed = if (walls.length > 1) walls.tail else walls
      val wall = timed.sorted.apply(timed.length / 2)
      val recall = (exact intersect got).size.toDouble / exact.size
      println(f"| $label | $recall%.3f | $wall%.2f |")
    }

    println(s"ANN family table: sfDir=$sfDir corpus=$n queries=5 k=10 (median of ${runs - 1} after warmup)")
    println("| family (pruned config) | recall@10 | probe wall s |")
    println("|---|---|---|")
    measure("flat scan (brute force)",
      () => Similarity.bruteForceTopK(queries, corpus, 10))
    measure("LSH 16x4-bit, 1 probe (the gated ann_lsh config)",
      () => Similarity.lshTopK(queries, corpus, 10, dim, 4, 16))
    measure("LSH 8x4-bit, 3 probes (the gated multiprobe config)",
      () => Similarity.lshTopKMultiProbe(queries, corpus, 10, dim, 4, 8, 3))
    measure(s"IVF k=8, nProbe=2 (seed ${SelectedSeeds.ivf})",
      () => IvfIndex.topK(queries, corpus, centroids, 10, nProbe = 2))
    measure(s"PQ 8×16, shortlist=100 (seed ${SelectedSeeds.pq})",
      () => PqIndex.topK(queries, corpus, pqCb, 10, shortlist = 100))
    measure(s"IVF-PQ nProbe=2, shortlist=50 (seed ${SelectedSeeds.ivfpq})",
      () => IvfPq.topK(spark, s"$tmp/ivfpq", queries, centsIvfPq, pqCbIvfPq, 10, 2, 50))
    measure(s"IVF-PQ residual nProbe=2, shortlist=50 (seed ${SelectedSeeds.res})",
      () => ResidualPq.topK(spark, s"$tmp/res", queries, centsRes, resCb, 10, 2, 50))
    measure(s"OPQ,IVF,PQ nProbe=2, shortlist=50 (seed ${SelectedSeeds.opq})",
      () => ResidualPq.topKRotated(spark, s"$tmp/opq", queries, rot, centsOpq, opqCb, 10, 2, 50))
    measure("SQ8 ADC (full codes scan)",
      () => Sq.topKAdc(queries, corpus, sqB, 10))
    measure("IVF-SQ8 nProbe=2, shortlist=50 (seed km)",
      () => IvfSq.topK(spark, s"$tmp/ivfsq", queries, centsKm, ivfSqB, 10, 2, 50))
    // graph family: the k-NN graph is the ingest-time artifact (like
    // every codebook above); the probe is the beam walk. Build wide
    // (the ProfileNnDescent overbuild lesson — a build-k=5 graph on
    // this isotropic corpus caps the walk at recall 0.24); entries
    // sized by the searchGraph coverage rule.
    val graph = NnDescent.knnGraph(corpus, k = 20, iters = 4, sample = 40)
      .persist()
    graph.count()
    measure("graph-ANN beam walk (build-k=20; entries=32, beam=10, hops=4)",
      () => NnDescent.searchGraph(graph, corpus, queries, 10,
        entries = 32, beam = 10, hops = 4))
    // the round-17 serving path: same walk from the persisted
    // node-id-bucketed adjacency, each hop pruned to frontier buckets
    NnDescent.writeGraphIndex(graph, s"$tmp/graphidx")
    measure("graph-ANN beam walk INDEXED (on-disk adjacency, bucket-pruned hops)",
      () => NnDescent.searchGraphIndexed(spark, s"$tmp/graphidx", corpus,
        queries, 10, entries = 32, beam = 10, hops = 4))
    spark.stop()
  }
}
