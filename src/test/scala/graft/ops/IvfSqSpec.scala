package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSqSpec extends SparkSpec {
  import spark.implicits._

  private def corpusAndQueries(sf: String) = {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    (queries, corpus)
  }

  private def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exhaustive probe + uncapped shortlist ≡ brute force") {
    val (queries, corpus) = corpusAndQueries(sf001)
    val exact = key(Similarity.bruteForceTopK(queries, corpus, k = 10))
    val centroids = IvfIndex.train(corpus, "id", "vec", k = 4, iters = 2)
    val b = IvfSq.trainBounds(corpus, centroids)
    val path = graft.Staging.dirFor("ivfsq-spec")
    IvfSq.writeIndex(corpus, centroids, b, path)
    val full = key(IvfSq.topK(spark, path, queries, centroids, b,
      k = 10, nProbe = 4, shortlist = Int.MaxValue))
    assert(full == exact)
  }

  test("pruned probe sits AT the coarse ceiling: SQ8 loses nothing within probed cells (sf0.01)") {
    // On the (roughly isotropic) real corpus the nProbe=2-of-8 COARSE
    // quantizer is the binding recall limit — true neighbors in
    // unprobed cells are unreachable by ANY fine code. The claim SQ8
    // makes is about what happens INSIDE the probed cells: its
    // per-dimension residual resolution ranks them essentially exactly,
    // so pruned recall must match the ceiling (the best any estimator
    // could do at this probe budget), not some fraction of it.
    val (queries, corpus) = corpusAndQueries("/root/testdata/sf0.01")
    val exact = key(Similarity.bruteForceTopK(queries, corpus, k = 10))
    val centroids = IvfIndex.train(corpus, "id", "vec", k = 8, iters = 2)
    val b = IvfSq.trainBounds(corpus, centroids)
    val path = graft.Staging.dirFor("ivfsq-spec-pruned")
    IvfSq.writeIndex(corpus, centroids, b, path)
    val pruned = key(IvfSq.topK(spark, path, queries, centroids, b,
      k = 10, nProbe = 2, shortlist = 50))
    // ceiling: exact cosine top-10 RESTRICTED to each query's 2 probed
    // cells — the ideal estimator at the same probe budget
    val probed = queries.select(col("qid"),
      explode(IvfIndex.probeCells(col("qvec"), centroids, 2)).as("cell"))
    val ideal = key(Similarity.rankPerQuery(
      IvfIndex.assignCells(corpus, "id", "vec", centroids)
        .join(probed, Seq("cell"))
        .join(broadcast(queries), Seq("qid"))
        .withColumn("score", Similarity.cosine(col("qvec"), col("vec"))),
      col("score"), 10))
    val ceiling = (exact intersect ideal).size.toDouble / exact.size
    val recall = (exact intersect pruned).size.toDouble / exact.size
    info(f"pruned recall=$recall%.3f, coarse nProbe=2 ceiling=$ceiling%.3f")
    assert(recall >= ceiling - 0.02,
      s"SQ8 must not lose recall inside probed cells: $recall vs ceiling $ceiling")
    assert(ceiling >= 0.3, s"degenerate ceiling $ceiling — probe setup broken?")
  }

  test("ADC pass reads codes only; vectors reach the re-rank scan alone") {
    val (queries, corpus) = corpusAndQueries(sf001)
    val centroids = IvfIndex.train(corpus, "id", "vec", k = 4, iters = 2)
    val b = IvfSq.trainBounds(corpus, centroids)
    val path = graft.Staging.dirFor("ivfsq-spec-plan")
    IvfSq.writeIndex(corpus, centroids, b, path)
    val got = IvfSq.topK(spark, path, queries, centroids, b,
      k = 10, nProbe = 2, shortlist = 30)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.exists(s => s.contains("codes") && !s.contains("vec")),
      s"no codes-only scan found:\n$plan")
    assert(schemas.forall(s => !(s.contains("codes") && s.contains("vec"))),
      s"a scan reads codes AND vectors — ADC pass not pruned:\n$plan")
    // probed-cell partition pruning: the scan must carry a cell filter
    assert(plan.contains("cell#") || plan.contains("PartitionFilters: [cell"),
      s"no cell partition filter visible:\n$plan")
  }

  test("frozen-quantizer epoch appends ≡ one full rewrite, replay-idempotent") {
    val (queries, corpus) = corpusAndQueries(sf001)
    val centroids = IvfIndex.train(corpus, "id", "vec", k = 4, iters = 2)
    val b = IvfSq.trainBounds(corpus, centroids)
    val whole = graft.Staging.dirFor("ivfsq-spec-whole")
    val epochs = graft.Staging.dirFor("ivfsq-spec-epochs")
    IvfSq.appendIndexEpoch(corpus, centroids, b, whole, -1L)
    val half1 = corpus.filter(pmod($"id", lit(2)) === 0)
    val half2 = corpus.filter(pmod($"id", lit(2)) === 1)
    IvfSq.appendIndexEpoch(half1, centroids, b, epochs, 0L)
    IvfSq.appendIndexEpoch(half2, centroids, b, epochs, 1L)
    val a = key(IvfSq.topK(spark, whole, queries, centroids, b,
      k = 10, nProbe = 4, shortlist = Int.MaxValue))
    val e = key(IvfSq.topK(spark, epochs, queries, centroids, b,
      k = 10, nProbe = 4, shortlist = Int.MaxValue))
    assert(a == e, "epoch-appended index must probe identically to a rewrite")
    // replay epoch 1: overwrite-mode partition replace, results unchanged
    IvfSq.appendIndexEpoch(half2, centroids, b, epochs, 1L)
    val r = key(IvfSq.topK(spark, epochs, queries, centroids, b,
      k = 10, nProbe = 4, shortlist = Int.MaxValue))
    assert(r == e)
  }

  test("codes are bytes over the residual geometry; constant dims stay 0") {
    val (_, corpus) = corpusAndQueries(sf001)
    val centroids = IvfIndex.train(corpus, "id", "vec", k = 4, iters = 2)
    val b = IvfSq.trainBounds(corpus, centroids)
    val codes = IvfSq.encoded(corpus, centroids, b)
      .select(explode($"codes").as("c")).as[Int].collect()
    assert(codes.nonEmpty && codes.forall(c => c >= 0 && c <= 255))
  }
}
