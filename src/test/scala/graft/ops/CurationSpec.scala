package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("keep-first exact dedup: lowest doc_id survives per duplicate group") {
    // The harness corpus has no exact duplicates, so the dedup stage's
    // semantics are pinned here on crafted ones. High-quality English
    // text so the upstream filters pass everything.
    val text = "the quick brown fox jumps over the lazy dog and " * 12
    val docs = Seq(
      (30L, text, "srcA"), (10L, text, "srcA"), (20L, text, "srcB"),
      (40L, text + "unique tail", "srcB"))
      .toDF("doc_id", "text", "source")
    val kept = Curation.curate(docs, "doc_id", "text", minQuality = 0.0)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 40L),
      s"expected lowest-id representative + the distinct doc, got $kept")
  }

  test("filters are load-bearing: und-language and low-quality docs drop") {
    val docs = Seq(
      (1L, "the cat sat on the mat with a hat and that is that", "s"), // en, decent
      (2L, "zzz qqq xxx", "s"), // no language markers -> und
      (3L, "a b", "s")) // en marker but tiny -> low quality
      .toDF("doc_id", "text", "source")
    val kept = Curation.curate(docs, "doc_id", "text", minQuality = 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"got $kept")
  }

  test("report matches a first-principles recomputation on the real corpus") {
    val docs = Tables.documents(spark, sf001)
    val rep = Curation.report(docs, "doc_id", "text", minQuality = 0.55)
      .collect()
    assert(rep.nonEmpty, "curation output empty at sf0.001")
    // totals line up with the curated row set
    val curated = Curation.curate(docs, "doc_id", "text", minQuality = 0.55)
    assert(rep.map(_.getAs[Long]("n_docs")).sum == curated.count())
    // per-group min <= avg <= max, and quality floor respected
    rep.foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_quality"),
        r.getAs[Double]("avg_quality"), r.getAs[Double]("max_quality"))
      assert(mn >= 0.55 && mn <= mx, s"quality floor violated: $r")
      assert(av >= mn - 0.005 && av <= mx + 0.005, s"avg outside [min,max]: $r")
    }
  }

  test("near-dup composition: cluster members collapse to one representative after filters") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    val docs = Seq(
      // near-dup cluster: same long text with tiny local edits
      (10L, base + "alpha ending", "sA"),
      (11L, base + "beta ending", "sA"),
      (12L, base + "gamma ending", "sB"),
      // distinct doc, passes filters
      (20L, "a cat sat on the mat with a hat and that is that and more " * 8, "sB"),
      // near-dup of the cluster but und-language? no — filtered for low quality instead
      (30L, "a b", "sC"))
      .toDF("doc_id", "text", "source")
    val kept = Curation.curateNearDup(docs, "doc_id", "text", minQuality = 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L),
      s"cluster -> min-id representative, distinct kept, low-quality dropped: $kept")
  }

  test("curation plan: filters reach the scan before any exchange") {
    val plan = Curation.curate(Tables.documents(spark, sf001),
      "doc_id", "text", minQuality = 0.55).queryExecution.executedPlan.toString
    // exactly one shuffle (the dedup window) — scoring and filtering
    // must not introduce exchanges of their own
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$plan")
  }
}
