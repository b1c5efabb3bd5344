package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming near-dup ingestion gate: in-batch collapse, cross-batch
  * index probe, index growth, and epoch-replay idempotence. */
class IngestGateSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: IndexedSeq[String] =
    (0 until 150).map(i => s"v$i")

  private def mkText(seed: Int, words: Int = 60): String = {
    val rnd = new scala.util.Random(seed)
    (1 to words).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private def nearCopy(seed: Int): String = {
    val t = mkText(seed).split(" "); t(30) = "ALTERED"; t.mkString(" ")
  }

  test("gateBatch: in-batch near-dups collapse, cross-batch dups rejected via the index, novel docs pass") {
    val idx = graft.Staging.dirFor("ingate-idx")
    val acc = graft.Staging.dirFor("ingate-acc")
    // epoch 0: A, B novel — both accepted
    val b0 = Seq((1L, mkText(1)), (2L, mkText(2))).toDF("doc_id", "text")
    assert(IngestGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text") == 2L)
    // epoch 1: A' (near-dup of accepted A) rejected by the index probe;
    // C and C' arrive together — in-batch collapse keeps only C;
    // D novel passes
    val b1 = Seq(
      (10L, nearCopy(1)),   // vs corpus → rejected
      (11L, mkText(7)),     // C
      (12L, nearCopy(7)),   // C' in-batch near-dup of C → rejected
      (13L, mkText(8))      // D novel
    ).toDF("doc_id", "text")
    assert(IngestGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text") == 2L)
    val accepted = spark.read.parquet(acc)
      .select("doc_id").as[Long].collect().toSet
    assert(accepted == Set(1L, 2L, 11L, 13L), s"got $accepted")
    // the index covers exactly the accepted corpus — batch 2 will see
    // batch 1's acceptances
    val indexed = spark.read.parquet(idx)
      .select("id").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 11L, 13L), s"index ids: $indexed")
    // epoch 2: near-dup of a doc accepted in epoch 1 → rejected
    val b2 = Seq((20L, nearCopy(8))).toDF("doc_id", "text")
    assert(IngestGate.gateBatch(b2, 2L, idx, acc, "doc_id", "text") == 0L)
  }

  test("gateBatch epoch replay is idempotent: re-running a batch id replaces its output") {
    val idx = graft.Staging.dirFor("ingate-replay-idx")
    val acc = graft.Staging.dirFor("ingate-replay-acc")
    val b0 = Seq((1L, mkText(1)), (2L, mkText(2))).toDF("doc_id", "text")
    IngestGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text")
    // a foreachBatch retry re-delivers the same epoch
    IngestGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text")
    assert(spark.read.parquet(acc).count() == 2L,
      "replayed epoch must overwrite, not duplicate")
    assert(spark.read.parquet(idx).select("id").distinct().count() == 2L)
  }

  test("epoch replay never self-rejects: the replayed epoch's own partition is excluded from the probe") {
    // At threshold ≤ 1/3 a replayed doc probed against its own prior
    // copy would self-pair at jaccard exactly 1/3 (union-doubled
    // sizes), reject the whole epoch, and overwrite its committed
    // output with an empty directory. The gate must exclude
    // batch=batchId from both the index and the corpus reads.
    val idx = graft.Staging.dirFor("ingate-selfpair-idx")
    val acc = graft.Staging.dirFor("ingate-selfpair-acc")
    val b0 = Seq((1L, mkText(1)), (2L, mkText(2))).toDF("doc_id", "text")
    assert(IngestGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text",
      threshold = 0.3) == 2L)
    // retry of the same epoch after its sinks committed
    assert(IngestGate.gateBatch(b0, 0L, idx, acc, "doc_id", "text",
      threshold = 0.3) == 2L,
      "replayed epoch must not be probed against its own output")
    assert(spark.read.parquet(acc).count() == 2L)
    // and a LATER epoch still sees epoch 0 in the index
    val b1 = Seq((10L, nearCopy(1))).toDF("doc_id", "text")
    assert(IngestGate.gateBatch(b1, 1L, idx, acc, "doc_id", "text",
      threshold = 0.3) == 0L)
  }

  test("AnnSink(residual = true): gate maintains a residual-encoded index; appends ≡ full rewrite; replay idempotent") {
    import graft.Tables
    import graft.ops.{IvfIndex, ResidualPq}
    import org.apache.spark.sql.functions.col
    val idx = graft.Staging.dirFor("ingate-res-idx")
    val acc = graft.Staging.dirFor("ingate-res-acc")
    val annDir = graft.Staging.dirFor("ingate-res-pq")
    val fullDir = graft.Staging.dirFor("ingate-res-full")
    val vecs = Tables.embeddings(spark, sf001).filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    def doc(id: Long): (Long, String, Seq[Float]) = (id, mkText(id.toInt), vecs(id))
    val trainDf = Tables.embeddings(spark, sf001).filter(col("vec_id") < 60)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = IvfIndex.train(trainDf, "id", "vec", k = 4)
    // RESIDUAL-trained codebooks, as the AnnSink contract requires
    val rcb = ResidualPq.trainCodebooks(trainDf, cents, m = 4, k = 8)
    val ann = Some(IngestGate.AnnSink(annDir, "vec", cents, rcb, residual = true))
    val e0 = Seq(doc(1L), doc(2L), doc(3L)).toDF("doc_id", "text", "vec")
    val e1 = Seq(doc(10L), doc(11L)).toDF("doc_id", "text", "vec")
    assert(IngestGate.gateBatch(e0, 0L, idx, acc, "doc_id", "text", ann = ann) == 3L)
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text", ann = ann) == 2L)
    // full residual rewrite of the same accepted corpus, same quantizers
    val acceptedVecs = spark.read.parquet(acc)
      .select(col("doc_id").as("id"), col("vec"))
    ResidualPq.writeIndex(acceptedVecs, cents, rcb, fullDir)
    val queries = Tables.embeddings(spark, sf001)
      .filter(col("vec_id") >= 100 && col("vec_id") < 103)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(path: String): Seq[(Long, Long, Int)] =
      ResidualPq.topK(spark, path, queries, cents, rcb,
          k = 3, nProbe = 4, shortlist = Int.MaxValue)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val streamed = probe(annDir)
    assert(streamed.nonEmpty && streamed == probe(fullDir),
      "gate-maintained residual index must probe ≡ full residual rewrite")
    // replay idempotence carries over to the residual sink
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text", ann = ann) == 2L)
    assert(probe(annDir) == streamed, "replayed epoch must leave probes unchanged")
  }

  test("GraphSink: gate maintains the graph serving index; superset edges lose no recall; exhaustive serving exact; replay idempotent") {
    import graft.Tables
    import graft.ops.NnDescent
    import org.apache.spark.sql.functions.{broadcast, col, round, row_number}
    val idx = graft.Staging.dirFor("ingate-graph-idx")
    val acc = graft.Staging.dirFor("ingate-graph-acc")
    val gdir = graft.Staging.dirFor("ingate-graph-g")
    val vecs = Tables.embeddings(spark, sf001).filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    def doc(id: Long): (Long, String, Seq[Float]) = (id, mkText(id.toInt), vecs(id))
    val sink = Some(IngestGate.GraphSink(gdir, "vec", k = 3, iters = 2,
      numBuckets = 8))
    val e0 = (1L to 8L).map(doc).toDF("doc_id", "text", "vec")
    val e1 = (20L to 25L).map(doc).toDF("doc_id", "text", "vec")
    assert(IngestGate.gateBatch(e0, 0L, idx, acc, "doc_id", "text",
      graph = sink) == 8L)
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text",
      graph = sink) == 6L)
    val nodes = spark.read.parquet(acc)
      .select(col("doc_id").as("id"), col("vec"))
    // (1) the served adjacency is a superset of the latest refreshed graph
    val stored = spark.read.parquet(s"$gdir/index")
      .select("c", "v").as[(Long, Long)].collect().toSet
    val refreshed = spark.read.parquet(s"$gdir/state/batch=1")
    val refreshedUnd = refreshed
      .select(col("id").as("c"), col("nbr").as("v"))
      .union(refreshed.select(col("nbr").as("c"), col("id").as("v")))
      .as[(Long, Long)].collect().toSet
    assert(refreshedUnd.subsetOf(stored),
      "every refreshed undirected edge must be servable from the sink's index")
    // (2) exhaustive-expansion serving over the maintained store is the
    // exact 4-dp flat scan of the accepted corpus — answer correctness
    val n = nodes.count().toInt
    val queries = Tables.embeddings(spark, sf001)
      .filter(col("vec_id") >= 100 && col("vec_id") < 103)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val served = NnDescent.searchGraphIndexed(spark, s"$gdir/index", nodes,
        queries, k = 3, entries = n, beam = 5, hops = 1, numBuckets = 8)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val flat = nodes.crossJoin(broadcast(queries))
      .select(col("qid"), col("id"),
        round(graft.ops.Similarity.cosine(col("qvec"), col("vec")), 4).as("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 3)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(served == flat,
      "exhaustive serving from the gate-maintained store must be exact")
    // (3) the superset does not LOSE recall vs the refreshed graph alone
    def recallVsFlat(rows: Seq[(Long, Long, Int)]): Double = {
      val want = flat.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val per = want.map { case (q, w) =>
        got.getOrElse(q, Set.empty).count(w).toDouble / w.size }
      per.sum / per.size
    }
    val prunedServed = NnDescent.searchGraphIndexed(spark, s"$gdir/index",
        nodes, queries, k = 3, entries = 3, beam = 3, hops = 2, numBuckets = 8)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val prunedInline = NnDescent.searchGraph(refreshed, nodes, queries,
        k = 3, entries = 3, beam = 3, hops = 2)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    assert(recallVsFlat(prunedServed) >= recallVsFlat(prunedInline),
      s"superset serving must not lose recall: served ${recallVsFlat(prunedServed)} " +
        s"vs inline ${recallVsFlat(prunedInline)}")
    // (4) replay idempotence: re-gating epoch 1 leaves the served
    // relation and the probe unchanged
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text",
      graph = sink) == 6L)
    assert(spark.read.parquet(s"$gdir/index")
      .select("c", "v").as[(Long, Long)].collect().toSet == stored,
      "epoch replay must leave the served edge set unchanged")
    // re-list the accepted corpus: the replay rewrote batch=1's files
    val nodesAfter = spark.read.parquet(acc)
      .select(col("doc_id").as("id"), col("vec"))
    assert(NnDescent.searchGraphIndexed(spark, s"$gdir/index", nodesAfter,
        queries, k = 3, entries = n, beam = 5, hops = 1, numBuckets = 8)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
      == served)
  }

  test("PostingsSink: gate maintains the lexical epoch store; probe ≡ flat rebuild over accepted; replay idempotent") {
    import graft.ops.TextIndex
    import org.apache.spark.sql.functions.col
    val idx = graft.Staging.dirFor("ingate-post-idx")
    val acc = graft.Staging.dirFor("ingate-post-acc")
    val pdir = graft.Staging.dirFor("ingate-post-lex")
    val sink = Some(IngestGate.PostingsSink(pdir))
    val e0 = Seq((1L, mkText(1)), (2L, mkText(2))).toDF("doc_id", "text")
    val e1 = Seq((10L, nearCopy(1)), (11L, mkText(7))).toDF("doc_id", "text")
    assert(IngestGate.gateBatch(e0, 0L, idx, acc, "doc_id", "text",
      postings = sink) == 2L)
    // 10 is a near-dup of 1 → rejected; ONLY survivors reach the store
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text",
      postings = sink) == 1L)
    val terms = mkText(7).split("\\s+").distinct.take(5).toSeq
    val epochHits = TextIndex.bm25TopKEpochs(spark, pdir, terms, k = 10)
      .as[(Long, Double, Int)].collect().toSeq
    assert(epochHits.map(_._1).contains(11L),
      "batch-1 survivors must be lexically retrievable")
    assert(!spark.read.parquet(s"$pdir/postings")
      .select("id").as[Long].collect().contains(10L),
      "a gate-rejected near-dup must never enter the lexical store")
    // probe ≡ a flat rebuild over exactly the accepted corpus
    val flat = graft.Staging.dirFor("ingate-post-flat")
    TextIndex.writePostings(
      spark.read.parquet(acc).select(col("doc_id"), col("text")),
      "doc_id", "text", flat)
    assert(epochHits == TextIndex.bm25TopKIndexed(spark, flat, terms, k = 10)
      .as[(Long, Double, Int)].collect().toSeq,
      "gate-maintained lexical store must answer like a rebuilt one")
    // replay idempotence
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text",
      postings = sink) == 1L)
    assert(TextIndex.bm25TopKEpochs(spark, pdir, terms, k = 10)
      .as[(Long, Double, Int)].collect().toSeq == epochHits)
    // a fully-rejected batch (all near-dups) writes NO epoch — the
    // graph sink's empty-epoch policy
    val allDup = Seq((20L, nearCopy(1)), (21L, nearCopy(2)))
      .toDF("doc_id", "text")
    assert(IngestGate.gateBatch(allDup, 2L, idx, acc, "doc_id", "text",
      postings = sink) == 0L)
    val epochDirs2 = new java.io.File(s"$pdir/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(epochDirs2 == Set("batch=0", "batch=1"),
      s"a fully-rejected batch must not write a junk epoch: $epochDirs2")
    assert(TextIndex.bm25TopKEpochs(spark, pdir, terms, k = 10)
      .as[(Long, Double, Int)].collect().toSeq == epochHits)
  }

  test("AnnSink: streamed epoch appends probe identically to a full rewrite; replay idempotent") {
    import graft.Tables
    import graft.ops.{IvfIndex, IvfPq, PqIndex}
    import org.apache.spark.sql.functions.col
    val idx = graft.Staging.dirFor("ingate-ann-idx")
    val acc = graft.Staging.dirFor("ingate-ann-acc")
    val annDir = graft.Staging.dirFor("ingate-ann-pq")
    val fullDir = graft.Staging.dirFor("ingate-ann-full")
    // doc rows: novel texts (all pass the gate) carrying real embeddings
    val vecs = Tables.embeddings(spark, sf001).filter(col("vec_id") < 60)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    def doc(id: Long): (Long, String, Seq[Float]) = (id, mkText(id.toInt), vecs(id))
    // FROZEN quantizers, trained once on the stream's own embedding
    // distribution (at scale: the last full rewrite's corpus)
    val trainDf = Tables.embeddings(spark, sf001).filter(col("vec_id") < 60)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = IvfIndex.train(trainDf, "id", "vec", k = 4)
    val cb = PqIndex.train(trainDf, "id", "vec", m = 4, k = 8)
    val ann = Some(IngestGate.AnnSink(annDir, "vec", cents, cb))
    // three gated epochs
    val e0 = Seq(doc(1L), doc(2L), doc(3L)).toDF("doc_id", "text", "vec")
    val e1 = Seq(doc(10L), doc(11L)).toDF("doc_id", "text", "vec")
    val e2 = Seq(doc(20L), doc(21L), doc(22L)).toDF("doc_id", "text", "vec")
    assert(IngestGate.gateBatch(e0, 0L, idx, acc, "doc_id", "text", ann = ann) == 3L)
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text", ann = ann) == 2L)
    assert(IngestGate.gateBatch(e2, 2L, idx, acc, "doc_id", "text", ann = ann) == 3L)
    // full rewrite of the SAME accepted corpus with the same quantizers
    val acceptedVecs = spark.read.parquet(acc)
      .select(col("doc_id").as("id"), col("vec"))
    IvfPq.writeIndex(acceptedVecs, cents, cb, fullDir)
    val queries = Tables.embeddings(spark, sf001)
      .filter(col("vec_id") >= 100 && col("vec_id") < 103)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def probe(path: String): Seq[(Long, Long, Int)] =
      IvfPq.topK(spark, path, queries, cents, cb, k = 3, nProbe = 4, shortlist = 64)
        .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSeq.sorted
    val streamed = probe(annDir)
    assert(streamed.nonEmpty && streamed == probe(fullDir),
      "epoch-appended index must answer probes exactly like a full rewrite")
    // a foreachBatch retry of epoch 1 must not change the index
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text", ann = ann) == 2L)
    assert(probe(annDir) == streamed, "replayed epoch must leave probes unchanged")
    // and the probed-cell filter still prunes: only probed cells are read
    val plan = IvfPq.topK(spark, annDir, queries, cents, cb, 3, 1, 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"cell probe must remain a partition filter under batch=/cell= layout:\n$plan")
  }

  test("streaming end-to-end: the gate runs under foreachBatch with cross-batch memory") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = graft.Staging.dirFor("ingate-s-idx")
    val acc = graft.Staging.dirFor("ingate-s-acc")
    val ckp = graft.Staging.dirFor("ingate-s-ckp")
    val mem = MemoryStream[(Long, String)]
    val q = IngestGate.start(mem.toDS().toDF("doc_id", "text"),
      idx, acc, ckp)
    try {
      mem.addData((1L, mkText(1)), (2L, mkText(2)))
      q.processAllAvailable()
      mem.addData((10L, nearCopy(1)), (11L, mkText(7)))
      q.processAllAvailable()
      val accepted = spark.read.parquet(acc)
        .select("doc_id").as[Long].collect().toSet
      assert(accepted == Set(1L, 2L, 11L), s"got $accepted")
    } finally q.stop()
  }
}
