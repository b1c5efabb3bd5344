package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup cell-scoped dedup ([[Dedup.semanticDropList]]): cluster
  * assignment scopes the quadratic search, smaller-id exemplar wins,
  * cross-cell near-dups are (by design) not candidates.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two orthogonal cells; ids 1-3 point along e1 (same cell), id 4
  // along e2. 1≈2≈3 are mutual near-dups within cell 0; nothing in
  // cell 1 has a partner.
  private val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 0.01f, 0.0f)),
    (2L, Seq(1.0f, 0.02f, 0.0f)),
    (3L, Seq(1.0f, 0.03f, 0.0f)),
    (4L, Seq(0.01f, 1.0f, 0.0f))).toDF("id", "vec")

  test("near-dups collapse to the smallest-id exemplar within a cell") {
    val dropped = Dedup.semanticDropList(vecs, "id", "vec", centroids, 0.99)
      .orderBy($"dropped_id").collect()
    assert(dropped.map(_.getAs[Long]("dropped_id")).toSeq == Seq(2L, 3L))
    // both collapse onto id 1 (the min qualifying partner), not a chain
    assert(dropped.map(_.getAs[Long]("exemplar_id")).toSeq == Seq(1L, 1L))
    assert(dropped.forall(_.getAs[Int]("cell") == 0))
    assert(dropped.forall(_.getAs[Double]("cos") >= 0.99))
  }

  test("cross-cell lookalikes are not candidates; survivors = input minus drop list") {
    // ids 5 and 6 are near-identical (cos ≈ 0.9999) but straddle the
    // cell boundary — the SemDeDup trade: they are never compared.
    val mixed = vecs.union(Seq(
      (5L, Seq(0.71f, 0.70f, 0.0f)),
      (6L, Seq(0.70f, 0.71f, 0.0f))).toDF("id", "vec"))
    val dropped = Dedup.semanticDropList(mixed, "id", "vec", centroids, 0.999)
      .collect()
    assert(dropped.map(_.getAs[Long]("dropped_id")).toSet == Set(2L, 3L))
    val kept = Dedup.semanticDedup(mixed, "id", "vec", centroids, 0.999)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 6L))
  }

  test("threshold gates the drop: nothing collapses at an unreachable bar") {
    assert(Dedup.semanticDropList(vecs, "id", "vec", centroids, 0.999999999)
      .count() == 0)
  }

  test("incremental probe: batch vs index only, partition-pruned scan") {
    // Corpus = ids 1-4 indexed by cell; batch plants a twin of id 1
    // (same cell) and a cell-1 vector with no corpus near-dup. The
    // batch-internal pair (10, 11) must NOT appear — arrivals are only
    // compared against the index.
    val path = graft.Staging.dirFor("semantic-spec-index")
    graft.ops.IvfIndex.writeIndexed(
      vecs.toDF("id", "vec"), centroids, path)
    val batch = Seq(
      (10L, Seq(1.0f, 0.011f, 0.0f)),   // twin of corpus id 1
      (11L, Seq(1.0f, 0.012f, 0.0f)),   // twin of 10 — batch-internal
      (12L, Seq(0.02f, 1.0f, 0.0f))     // cell 1, twin of corpus id 4
    ).toDF("id", "vec")
    val probed = Dedup.semanticProbe(spark, path, batch, "id", "vec",
      centroids, 0.999)
    val rows = probed.orderBy($"new_id").collect()
    assert(rows.map(r => (r.getAs[Long]("new_id"),
      r.getAs[Long]("exemplar_id"))).toSeq ==
      Seq((10L, 1L), (11L, 1L), (12L, 4L)))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe scan must prune to the batch's cells:\n$plan")
  }

  test("recall honesty on real embeddings: trained cells recover most all-pairs dups") {
    // The SemDeDup trade quantified (the IvfIndexSpec recall
    // discipline): drop decisions from cell-scoped search vs the
    // all-pairs baseline at the same threshold. With a trained
    // quantizer, near-dups concentrate in cells — recall must be
    // high, and every cell-scoped drop must exist in the baseline
    // (precision is exact by construction: same cosine, same rule).
    val emb = graft.Tables.embeddings(spark, sf001)
    val tau = 0.35 // inside the corpus's observed within-label range
    val trained = IvfIndex.train(emb, "vec_id", "embedding", k = 4, iters = 2)
    val cellDrops = Dedup.semanticDropList(emb, "vec_id", "embedding", trained, tau)
      .select($"dropped_id").as[Long].collect().toSet
    // all-pairs baseline: a doc is dropped iff ANY smaller id is ≥ tau
    val allPairs = emb.select($"vec_id".as("id1"), $"embedding".as("v1"))
      .crossJoin(emb.select($"vec_id".as("id2"), $"embedding".as("v2")))
      .filter($"id1" < $"id2")
      .filter(Similarity.cosine($"v1", $"v2") >= tau)
      .select($"id2").distinct().as[Long].collect().toSet
    assert(cellDrops.subsetOf(allPairs), "cell-scoped drops must be true dups")
    assert(allPairs.nonEmpty, "threshold must be live on this corpus")
    val recall = cellDrops.size.toDouble / allPairs.size
    assert(recall >= 0.5, f"recall $recall%.2f vs all-pairs (${cellDrops.size}/${allPairs.size})")
  }

  test("production path: trained k-means quantizer finds the planted twin") {
    // 3 axis-aligned clusters with ±0.2 noise (cluster-mate cosine well
    // under 0.999) plus one near-exact twin of id 0 at id 100.
    val rnd = new scala.util.Random(1)
    def noisy(axis: Int): Seq[Float] =
      (0 until 4).map(d => ((if (d == axis) 1.0 else 0.0) +
        (rnd.nextDouble() - 0.5) * 0.4).toFloat)
    val rows = (0 until 30).map(i => (i.toLong, noisy(i % 3)))
    val corpus = (rows :+ ((100L,
      rows.head._2.map(x => x + 1e-4f)))).toDF("id", "vec")
    val trained = IvfIndex.train(corpus, "id", "vec", k = 3, iters = 2)
    val dropped = Dedup.semanticDropList(corpus, "id", "vec", trained, 0.999)
      .collect()
    assert(dropped.map(r => (r.getAs[Long]("dropped_id"),
      r.getAs[Long]("exemplar_id"))).toSeq == Seq((100L, 0L)))
  }
}
