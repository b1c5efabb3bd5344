package graft.ops

import graft.{SparkSpec, Tables}
import graft.streaming.IngestGate
import org.apache.spark.sql.functions._

/** Delete propagation ([[Retraction]]): victims disappear from every
  * gate sink (accepted corpus, band index, ANN index), only the
  * partitions that actually held victims are rewritten (untouched
  * partitions keep their exact files), and retraction is idempotent. */
class RetractionSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: IndexedSeq[String] = (0 until 150).map(i => s"w$i")
  private def mkText(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private def fileSet(dir: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getAbsolutePath, f.length())).toSet
  }

  test("retractAll: victims leave corpus, band index, and ANN index; untouched epochs keep their files; idempotent") {
    val idx = graft.Staging.dirFor("retract-idx")
    val acc = graft.Staging.dirFor("retract-acc")
    val ann = graft.Staging.dirFor("retract-ann")
    val vecs = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    def doc(id: Long) = (id, mkText(id.toInt), vecs(id))
    val trainDf = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(trainDf, "id", "vec", k = 4)
    val cb = PqIndex.train(trainDf, "id", "vec", m = 4, k = 8)
    val annSink = Some(IngestGate.AnnSink(ann, "vec", cents, cb))
    // two epochs; victims live only in epoch 0
    val e0 = Seq(doc(1L), doc(2L), doc(3L)).toDF("doc_id", "text", "vec")
    val e1 = Seq(doc(10L), doc(11L)).toDF("doc_id", "text", "vec")
    assert(IngestGate.gateBatch(e0, 0L, idx, acc, "doc_id", "text", ann = annSink) == 3L)
    assert(IngestGate.gateBatch(e1, 1L, idx, acc, "doc_id", "text", ann = annSink) == 2L)
    val epoch1Files = (fileSet(s"$acc/batch=1") ++ fileSet(s"$idx/batch=1")
      ++ fileSet(s"$ann/batch=1"))

    Retraction.retractAll(spark, Seq(1L, 3L), "doc_id", acc, idx, Some(ann))

    // victims gone from every sink; survivors intact
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      == Set(2L, 10L, 11L))
    assert(spark.read.parquet(idx).select("id").as[Long].collect().toSet
      == Set(2L, 10L, 11L))
    assert(spark.read.parquet(ann).select("id").as[Long].collect().toSet
      == Set(2L, 10L, 11L))
    // ANN probes still work and can never return a victim
    val queries = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 100 && $"vec_id" < 102)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val probed = IvfPq.topK(spark, ann, queries, cents, cb,
      k = 3, nProbe = 4, shortlist = 64)
      .select("id").as[Long].collect().toSet
    assert(probed.nonEmpty && !probed.contains(1L) && !probed.contains(3L))
    // epoch 1 held no victims — its files must be byte-identical
    assert((fileSet(s"$acc/batch=1") ++ fileSet(s"$idx/batch=1")
      ++ fileSet(s"$ann/batch=1")) == epoch1Files,
      "partitions without victims must not be rewritten")
    // idempotent: same delete list again rewrites nothing
    val accFiles = fileSet(acc)
    Retraction.retractAll(spark, Seq(1L, 3L), "doc_id", acc, idx, Some(ann))
    assert(fileSet(acc) == accFiles, "re-retracting must be a no-op")
  }

  test("retractAll sweeps the graph-ANN serving index (sixth store): victim gone as source AND neighbor; untouched epoch byte-identical; idempotent") {
    val acc = graft.Staging.dirFor("retract-graph-acc")
    val idx = graft.Staging.dirFor("retract-graph-idx")
    val gdir = graft.Staging.dirFor("retract-graph-store")
    val nodes = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val docs = nodes.select($"id".as("doc_id"))
      .as[Long].collect().map(i => (i, mkText(i.toInt))).toSeq
      .toDF("doc_id", "text")
    assert(IngestGate.gateBatch(docs, 0L, idx, acc, "doc_id", "text") == 40L)
    // two epochs: the base graph over ids < 30, then an append of the
    // rest — the victim arrives with the delta, so every edge that
    // mentions it (forward AND reverse) lives in batch=1 only, and the
    // rewrite must leave batch=0 byte-identical (the ANN-store
    // epoch-granularity contract)
    val base = nodes.filter($"id" < 30)
    val g0 = NnDescent.knnGraph(base, k = 4, iters = 2)
    NnDescent.writeGraphIndex(g0, gdir, numBuckets = 8, epoch = 0L)
    val delta = nodes.filter($"id" >= 30)
    val g1 = NnDescent.appendNodes(g0, nodes, delta, k = 4, iters = 2)
    NnDescent.appendGraphIndexEpoch(g1, gdir, epoch = 1L, numBuckets = 8)
    val victim = 35L
    // the victim is routable before the sweep (graph edges mention it)
    val before = spark.read.parquet(gdir)
    assert(before.filter($"c" === victim || $"v" === victim).count() > 0)
    val epoch0Files = fileSet(s"$gdir/batch=0")
    Retraction.retractAll(spark, Seq(victim), "doc_id", acc, idx,
      graphDir = Some(gdir))
    val after = spark.read.parquet(gdir)
    assert(after.filter($"c" === victim || $"v" === victim).count() == 0,
      "a forgotten doc must be unreachable AND unroutable-through")
    assert(after.count() > 0, "survivor edges must remain")
    assert(fileSet(s"$gdir/batch=0") == epoch0Files,
      "the epoch without victim rows must keep its exact files")
    // idempotent: a second sweep rewrites nothing
    val allFiles = fileSet(gdir)
    Retraction.retractAll(spark, Seq(victim), "doc_id", acc, idx,
      graphDir = Some(gdir))
    assert(fileSet(gdir) == allFiles, "re-retracting must be a no-op")
  }

  test("retractAll sweeps the containment-gate store (seventh): content becomes re-ingestable; untouched epoch byte-identical") {
    val acc = graft.Staging.dirFor("retract-cont-acc")
    val idx = graft.Staging.dirFor("retract-cont-idx")
    val cacc = graft.Staging.dirFor("retract-cont-gacc")
    val cidx = graft.Staging.dirFor("retract-cont-gidx")
    // gate two epochs through the containment gate; victim in epoch 1
    val page = "the quick brown fox jumps over the lazy dog tonight " +
      "and then a long discussion of canine behavior patterns"
    val other = "volcanic soil produces exceptionally robust coffee " +
      "beans across the equatorial highlands of three continents"
    val b0 = Seq((1L, other)).toDF("doc_id", "text")
    val b1 = Seq((7L, page)).toDF("doc_id", "text")
    assert(graft.streaming.ContainmentGate.gateBatch(b0, 0L, cidx, cacc,
      "doc_id", "text") == 1L)
    assert(graft.streaming.ContainmentGate.gateBatch(b1, 1L, cidx, cacc,
      "doc_id", "text") == 1L)
    // the banded-gate pair so retractAll has its mandatory sinks
    assert(graft.streaming.IngestGate.gateBatch(b1, 0L, idx, acc,
      "doc_id", "text") == 1L)
    // before the sweep the gate REJECTS a quote of the victim's content
    val quote = Seq((20L, "the quick brown fox jumps over the lazy " +
      "dog tonight")).toDF("doc_id", "text")
    assert(graft.streaming.ContainmentGate.gateBatch(quote, 2L, cidx, cacc,
      "doc_id", "text") == 0L)
    val epoch0Files = fileSet(s"$cidx/batch=0")

    Retraction.retractAll(spark, Seq(7L), "doc_id", acc, idx,
      containmentDir = Some(cidx))

    assert(spark.read.parquet(cidx).filter($"id" === 7L).count() == 0,
      "the victim's shingle rows must leave the gate store")
    assert(fileSet(s"$cidx/batch=0") == epoch0Files,
      "the epoch without victim rows must keep its exact files")
    // the forgotten content is re-ingestable: the same quote now PASSES
    assert(graft.streaming.ContainmentGate.gateBatch(quote, 3L, cidx, cacc,
      "doc_id", "text") == 1L,
      "after retraction the gate must no longer reject against the forgotten doc")
  }

  test("retractAll over a RESIDUAL-encoded ANN layout: probes victim-free, untouched epoch byte-identical, idempotent") {
    val acc = graft.Staging.dirFor("retract-res-acc")
    val idx = graft.Staging.dirFor("retract-res-idx")
    val ann = graft.Staging.dirFor("retract-res-ann")
    val emb = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(emb, "id", "vec", k = 4)
    val rcb = ResidualPq.trainCodebooks(emb, cents, m = 4, k = 8)
    // two epochs into the residual layout; victims live only in epoch 0
    val e0 = emb.filter($"id" < 20)
    val e1 = emb.filter($"id" >= 20)
    ResidualPq.appendIndexEpoch(e0, cents, rcb, ann, 0L)
    ResidualPq.appendIndexEpoch(e1, cents, rcb, ann, 1L)
    // corpus + band-index sinks (what retractAll sweeps besides the ANN
    // store) as minimal batch-partitioned layouts over the same ids
    emb.select($"id".as("doc_id"), lit("t").as("text"),
        (($"id" >= 20).cast("int")).as("batch"))
      .write.mode("overwrite").partitionBy("batch").parquet(acc)
    emb.select($"id", xxhash64($"id").as("sig"),
        (($"id" >= 20).cast("int")).as("batch"))
      .write.mode("overwrite").partitionBy("batch").parquet(idx)
    val epoch1Files = fileSet(s"$ann/batch=1")

    Retraction.retractAll(spark, Seq(1L, 3L), "doc_id", acc, idx, Some(ann))

    assert(spark.read.parquet(ann).select("id").as[Long].collect().toSet
      == (0L until 40L).toSet -- Set(1L, 3L))
    // an EXHAUSTIVE probe of the retracted index ≡ brute force over the
    // surviving corpus — the strongest victim-free statement available
    val queries = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 100 && $"vec_id" < 103)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val probed = ResidualPq.topK(spark, ann, queries, cents, rcb,
      k = 5, nProbe = 4, shortlist = Int.MaxValue)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val survivors = emb.filter(!$"id".isin(1L, 3L))
    val exact = Similarity.bruteForceTopK(queries, survivors, 5)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(probed == exact,
      "retracted residual index must probe exactly like one built without the victims")
    // epoch 1 held no victims — its files (incl. nested cell dirs) intact
    assert(fileSet(s"$ann/batch=1") == epoch1Files,
      "victim-free epoch of the residual layout must not be rewritten")
    // idempotent
    val annFiles = fileSet(ann)
    Retraction.retractAll(spark, Seq(1L, 3L), "doc_id", acc, idx, Some(ann))
    assert(fileSet(ann) == annFiles, "re-retracting must be a no-op")
  }

  test("retractAll over an IVF-SQ layout: probes victim-free, untouched epoch byte-identical, idempotent") {
    // The SQ-coded store shares the residual family's cell= nested
    // layout, so the generic sweep MUST serve it — but "must" is a spec,
    // not an assumption (the round-13 residual-PQ lesson).
    val acc = graft.Staging.dirFor("retract-sq-acc")
    val idx = graft.Staging.dirFor("retract-sq-idx")
    val ann = graft.Staging.dirFor("retract-sq-ann")
    val emb = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(emb, "id", "vec", k = 4)
    val b = IvfSq.trainBounds(emb, cents)
    val e0 = emb.filter($"id" < 20)
    val e1 = emb.filter($"id" >= 20)
    IvfSq.appendIndexEpoch(e0, cents, b, ann, 0L)
    IvfSq.appendIndexEpoch(e1, cents, b, ann, 1L)
    emb.select($"id".as("doc_id"), lit("t").as("text"),
        (($"id" >= 20).cast("int")).as("batch"))
      .write.mode("overwrite").partitionBy("batch").parquet(acc)
    emb.select($"id", xxhash64($"id").as("sig"),
        (($"id" >= 20).cast("int")).as("batch"))
      .write.mode("overwrite").partitionBy("batch").parquet(idx)
    val epoch1Files = fileSet(s"$ann/batch=1")

    Retraction.retractAll(spark, Seq(2L, 5L), "doc_id", acc, idx, Some(ann))

    assert(spark.read.parquet(ann).select("id").as[Long].collect().toSet
      == (0L until 40L).toSet -- Set(2L, 5L))
    val queries = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 100 && $"vec_id" < 103)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val probed = IvfSq.topK(spark, ann, queries, cents, b,
      k = 5, nProbe = 4, shortlist = Int.MaxValue)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val survivors = emb.filter(!$"id".isin(2L, 5L))
    val exact = Similarity.bruteForceTopK(queries, survivors, 5)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(probed == exact,
      "retracted IVF-SQ index must probe exactly like one built without the victims")
    assert(fileSet(s"$ann/batch=1") == epoch1Files,
      "victim-free epoch of the SQ layout must not be rewritten")
    val annFiles = fileSet(ann)
    Retraction.retractAll(spark, Seq(2L, 5L), "doc_id", acc, idx, Some(ann))
    assert(fileSet(ann) == annFiles, "re-retracting must be a no-op")
  }

  test("retractPostings: a BM25 probe never returns a victim; untouched buckets byte-identical; stats ≡ rebuilt; idempotent") {
    val pidx = graft.Staging.dirFor("retract-postings")
    // vocabulary big enough that with 64 buckets some hold no victim terms
    val docs = (1L to 30L).map(id => (id, mkText(id.toInt))).toDF("doc_id", "text")
    TextIndex.writePostings(docs, "doc_id", "text", pidx)
    val before = fileSet(s"$pidx/postings")
    // victim 7's term buckets — the only ones allowed to be rewritten
    val victimBuckets = spark.read.parquet(s"$pidx/postings")
      .filter($"id" === 7L).select("tb").distinct().as[Long].collect().toSet
    assert(victimBuckets.nonEmpty && victimBuckets.size < 64,
      s"test needs victim-free buckets to exist, got ${victimBuckets.size}")

    // minimal companion sinks so the full retractAll path runs
    val acc = graft.Staging.dirFor("retract-postings-acc")
    val bnd = graft.Staging.dirFor("retract-postings-bnd")
    Seq((7L, "t"), (8L, "t")).toDF("doc_id", "text")
      .write.parquet(s"$acc/batch=0")
    Seq((7L, 0L), (8L, 1L)).toDF("id", "bucket")
      .write.parquet(s"$bnd/batch=0")
    Retraction.retractAll(spark, Seq(7L), "doc_id", acc, bnd,
      postingsDir = Some(pidx))

    // the victim is gone from the postings relation entirely
    assert(spark.read.parquet(s"$pidx/postings").filter($"id" === 7L).isEmpty,
      "victim rows must be scrubbed")
    // a probe on the victim's own strongest terms cannot return it
    val victimTerms = mkText(7).split("\\s+").distinct.take(5).toSeq
    val hits = TextIndex.bm25TopKIndexed(spark, pidx, victimTerms, k = 30)
      .select("id").as[Long].collect().toSet
    assert(hits.nonEmpty && !hits.contains(7L),
      s"victim must be unretrievable, got $hits")
    // only victim buckets rewritten; every other bucket byte-identical
    val after = fileSet(s"$pidx/postings")
    val untouchedBefore = before.filter { case (p, _) =>
      !victimBuckets.exists(b => p.contains(s"tb=$b/")) }
    val untouchedAfter = after.filter { case (p, _) =>
      !victimBuckets.exists(b => p.contains(s"tb=$b/")) }
    assert(untouchedBefore == untouchedAfter,
      "buckets without victim rows must keep their exact files")
    // stats are bit-identical to a fresh index over the surviving docs
    val rebuilt = graft.Staging.dirFor("retract-postings-rebuilt")
    TextIndex.writePostings(docs.filter($"doc_id" =!= 7L), "doc_id", "text", rebuilt)
    val gotStats = spark.read.parquet(s"$pidx/stats").collect().head
    val wantStats = spark.read.parquet(s"$rebuilt/stats").collect().head
    assert(gotStats == wantStats, s"stats $gotStats vs rebuilt $wantStats")
    // and therefore the probe scores exactly like the rebuilt index
    val rebuiltHits = TextIndex.bm25TopKIndexed(spark, rebuilt, victimTerms, k = 30)
      .collect().toSeq
    assert(TextIndex.bm25TopKIndexed(spark, pidx, victimTerms, k = 30)
      .collect().toSeq == rebuiltHits)
    // idempotent: same delete list again rewrites no postings bucket
    val files = fileSet(s"$pidx/postings")
    Retraction.retractPostings(spark, pidx, Seq(7L))
    assert(fileSet(s"$pidx/postings") == files, "re-retracting must be a no-op")
  }

  test("retractPostingsEpochs: victim unretrievable, probe ≡ rebuilt epoch store, stats exact, untouched partitions byte-identical, idempotent") {
    val pidx = graft.Staging.dirFor("retract-postings-epochs")
    val docs = (1L to 30L).map(id => (id, mkText(id.toInt))).toDF("doc_id", "text")
    TextIndex.appendPostingsEpoch(docs.filter($"doc_id" <= 15L),
      "doc_id", "text", pidx, epoch = 0L)
    TextIndex.appendPostingsEpoch(docs.filter($"doc_id" > 15L),
      "doc_id", "text", pidx, epoch = 1L)
    val before = fileSet(s"$pidx/postings")
    val victimBuckets = spark.read.parquet(s"$pidx/postings")
      .filter($"id" === 7L).select("tb").distinct().as[Long].collect().toSet

    // through the full sweep: the epoch store is the ninth store
    val acc = graft.Staging.dirFor("retract-pe-acc")
    val bnd = graft.Staging.dirFor("retract-pe-bnd")
    Seq((7L, "t"), (8L, "t")).toDF("doc_id", "text")
      .write.parquet(s"$acc/batch=0")
    Seq((7L, 0L), (8L, 1L)).toDF("id", "bucket")
      .write.parquet(s"$bnd/batch=0")
    Retraction.retractAll(spark, Seq(7L), "doc_id", acc, bnd,
      postingsEpochsDir = Some(pidx))

    assert(spark.read.parquet(s"$pidx/postings").filter($"id" === 7L).isEmpty)
    val victimTerms = mkText(7).split("\\s+").distinct.take(5).toSeq
    val hits = TextIndex.bm25TopKEpochs(spark, pidx, victimTerms, k = 30)
      .select("id").as[Long].collect().toSet
    assert(hits.nonEmpty && !hits.contains(7L),
      s"victim must be unretrievable, got $hits")
    // probe ≡ an epoch store rebuilt without the victim (same split)
    val rebuilt = graft.Staging.dirFor("retract-postings-epochs-rebuilt")
    TextIndex.appendPostingsEpoch(
      docs.filter($"doc_id" <= 15L && $"doc_id" =!= 7L),
      "doc_id", "text", rebuilt, epoch = 0L)
    TextIndex.appendPostingsEpoch(docs.filter($"doc_id" > 15L),
      "doc_id", "text", rebuilt, epoch = 1L)
    assert(TextIndex.bm25TopKEpochs(spark, pidx, victimTerms, k = 30)
        .collect().toSeq ==
      TextIndex.bm25TopKEpochs(spark, rebuilt, victimTerms, k = 30)
        .collect().toSeq)
    // the victim lives in epoch 0 only: the sweep's granularity is the
    // epoch, so epoch 1 keeps its exact files (and the rewritten
    // epoch 0 keeps the nested tb layout)
    val after = fileSet(s"$pidx/postings")
    def untouched(fs: Set[(String, Long)]) =
      fs.filter { case (p, _) => p.contains("batch=1/") }
    assert(untouched(before) == untouched(after),
      "epochs without victim rows must keep their exact files")
    assert(victimBuckets.forall(b =>
      new java.io.File(s"$pidx/postings/batch=0/tb=$b").isDirectory),
      "the rewritten epoch must keep its nested tb layout")
    // the rewritten per-epoch stats match the rebuilt store's exactly
    assert(spark.read.parquet(s"$pidx/estats")
        .select("batch", "n_docs", "sum_dl").collect().toSet ==
      spark.read.parquet(s"$rebuilt/estats")
        .select("batch", "n_docs", "sum_dl").collect().toSet)
    // idempotent
    val files = fileSet(s"$pidx/postings")
    Retraction.retractPostingsEpochs(spark, pidx, Seq(7L))
    assert(fileSet(s"$pidx/postings") == files, "re-retracting must be a no-op on postings")
  }

  test("recovery repairs every interrupted-swap window; nothing silently vanishes") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())
    def mk(tag: String): String = {
      val d = graft.Staging.dirFor(s"retract-crash-$tag")
      (0 until 2).foreach { e =>
        Seq((e * 10L, s"d$e"), (e * 10L + 1, s"x$e")).toDF("doc_id", "text")
          .write.mode("overwrite").parquet(s"$d/batch=$e")
      }
      d
    }
    def ids(d: String) =
      spark.read.parquet(d).select("doc_id").as[Long].collect().toSet
    val all = Set(0L, 1L, 10L, 11L)

    // window 1: crash during the temp write → stale (partial) temp next
    // to the live partition; recovery drops the temp
    val d1 = mk("w1")
    fs.mkdirs(new Path(s"$d1/.retract-batch-0"))
    Retraction.recover(spark, d1)
    assert(ids(d1) == all && !new java.io.File(s"$d1/.retract-batch-0").exists())

    // window 2: crash between the two renames → complete temp, victim
    // parked aside, partition missing; recovery promotes the temp (the
    // previously-lost-partition case the old delete-then-rename had)
    val d2 = mk("w2")
    Seq((10L, "d1")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d2/.retract-batch-1")
    fs.rename(new Path(s"$d2/batch=1"), new Path(s"$d2/.retract-aside-batch-1"))
    Retraction.recover(spark, d2)
    assert(ids(d2) == Set(0L, 1L, 10L), s"survivors promoted: ${ids(d2)}")
    assert(!new java.io.File(s"$d2/.retract-aside-batch-1").exists())

    // window 3: crash after the swap, before aside cleanup → recovery
    // drops the superseded aside
    val d3 = mk("w3")
    fs.rename(new Path(s"$d3/batch=1"), new Path(s"$d3/.retract-aside-batch-1"))
    Seq((10L, "d1")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d3/batch=1")
    Retraction.recover(spark, d3)
    assert(ids(d3) == Set(0L, 1L, 10L))
    assert(!new java.io.File(s"$d3/.retract-aside-batch-1").exists())

    // and retract() itself runs recovery on entry: a stale aside from a
    // crashed run does not break a fresh retraction
    val d4 = mk("w4")
    fs.rename(new Path(s"$d4/batch=1"), new Path(s"$d4/.retract-aside-batch-1"))
    Retraction.retract(spark, d4, "doc_id", Seq(0L))
    assert(ids(d4) == all - 0L, s"got ${ids(d4)}")
  }

  test("retractAll sweeps the LSH bucketed postings: an indexed probe never returns a victim; untouched buckets byte-identical; idempotent") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val lsh = graft.Staging.dirFor("retract-lsh")
    Similarity.writeLshBucketed(corpus, dim = 64, bitsPerTable = 4,
      tables = 16, lsh)
    // victims: docs the probe actually RETURNS pre-retraction, so the
    // assertion below tests retrievability, not just row absence
    val pre = Similarity.lshTopKIndexed(spark, lsh, queries, k = 10,
      dim = 64, bitsPerTable = 4, tables = 16)
    val victims = pre.select("id").as[Long].collect().distinct.take(3).toSeq
    assert(victims.nonEmpty)
    val victimBuckets = spark.read.parquet(lsh)
      .filter($"id".isin(victims: _*))
      .select("bucket").distinct().as[String].collect().toSet
    val before = fileSet(lsh)
    assert(victimBuckets.nonEmpty && before.exists { case (p, _) =>
      !victimBuckets.exists(b => p.contains(s"bucket=$b/")) },
      "test needs victim-free buckets to exist")

    // minimal companion sinks so the full retractAll path runs
    val acc = graft.Staging.dirFor("retract-lsh-acc")
    val bnd = graft.Staging.dirFor("retract-lsh-bnd")
    (victims :+ 9999L).map(id => (id, s"t$id")).toDF("doc_id", "text")
      .write.parquet(s"$acc/batch=0")
    (victims :+ 9999L).map(id => (id, 0L)).toDF("id", "bucket")
      .write.parquet(s"$bnd/batch=0")
    Retraction.retractAll(spark, victims, "doc_id", acc, bnd,
      lshDir = Some(lsh))

    // victims are gone from the layout and unretrievable by probe
    assert(spark.read.parquet(lsh).filter($"id".isin(victims: _*)).isEmpty)
    val hits = Similarity.lshTopKIndexed(spark, lsh, queries, k = 10,
      dim = 64, bitsPerTable = 4, tables = 16)
      .select("id").as[Long].collect().toSet
    assert(hits.nonEmpty && victims.forall(v => !hits.contains(v)),
      s"victims $victims must be unretrievable, got $hits")
    // only buckets that held a victim were rewritten
    val after = fileSet(lsh)
    def untouched(s: Set[(String, Long)]) = s.filter { case (p, _) =>
      !victimBuckets.exists(b => p.contains(s"bucket=$b/")) }
    assert(untouched(before) == untouched(after),
      "buckets without victim rows must keep their exact files")
    // idempotent: the same delete list rewrites nothing
    Retraction.retract(spark, lsh, "id", victims, partCol = "bucket")
    assert(fileSet(lsh) == after, "re-retracting must be a no-op")
  }

  test("stats-swap crash windows leave a readable stats relation; retractPostings self-repairs on entry") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())
    def mk(tag: String): String = {
      val d = graft.Staging.dirFor(s"retract-stats-crash-$tag")
      val docs = (1L to 10L).map(id => (id, mkText(id.toInt))).toDF("doc_id", "text")
      TextIndex.writePostings(docs, "doc_id", "text", d)
      d
    }
    def stats(d: String) = spark.read.parquet(s"$d/stats").collect().head

    // window A: crash between the two renames — stats MISSING, old copy
    // parked aside, complete tmp present; recovery promotes the tmp
    val dA = mk("wA")
    val oldA = stats(dA)
    spark.read.parquet(s"$dA/stats")
      .write.mode("overwrite").parquet(s"$dA/.stats-tmp")
    fs.rename(new Path(s"$dA/stats"), new Path(s"$dA/.stats-aside"))
    Retraction.recoverStats(spark, dA)
    assert(stats(dA) == oldA, "tmp promoted to stats")
    assert(!new java.io.File(s"$dA/.stats-aside").exists()
      && !new java.io.File(s"$dA/.stats-tmp").exists())

    // window B: same crash but the tmp is also gone — restore the aside
    // (old stats come back; the retraction just re-runs)
    val dB = mk("wB")
    val oldB = stats(dB)
    fs.rename(new Path(s"$dB/stats"), new Path(s"$dB/.stats-aside"))
    Retraction.recoverStats(spark, dB)
    assert(stats(dB) == oldB, "aside restored as stats")

    // window C: crash after the swap landed — superseded aside and a
    // stale partial tmp next to live stats; recovery drops both
    val dC = mk("wC")
    val oldC = stats(dC)
    fs.mkdirs(new Path(s"$dC/.stats-aside"))
    fs.mkdirs(new Path(s"$dC/.stats-tmp"))
    Retraction.recoverStats(spark, dC)
    assert(stats(dC) == oldC)
    assert(!new java.io.File(s"$dC/.stats-aside").exists()
      && !new java.io.File(s"$dC/.stats-tmp").exists())

    // and retractPostings runs the repair on entry: the window-A crash
    // state (NO stats relation on disk) does not break a fresh
    // retraction — the previously-broken window
    val dD = mk("wD")
    spark.read.parquet(s"$dD/stats")
      .write.mode("overwrite").parquet(s"$dD/.stats-tmp")
    fs.rename(new Path(s"$dD/stats"), new Path(s"$dD/.stats-aside"))
    Retraction.retractPostings(spark, dD, Seq(3L))
    assert(spark.read.parquet(s"$dD/postings").filter($"id" === 3L).isEmpty)
    val rebuilt = graft.Staging.dirFor("retract-stats-crash-rebuilt")
    TextIndex.writePostings(
      (1L to 10L).filter(_ != 3L).map(id => (id, mkText(id.toInt))).toDF("doc_id", "text"),
      "doc_id", "text", rebuilt)
    assert(stats(dD) == stats(rebuilt),
      "post-crash retraction ends with stats ≡ rebuilt index")
  }

  test("retractAll sweeps the simhash serving store (eighth): probe ≡ rebuilt-without-victim; untouched epoch byte-identical; idempotent") {
    val acc = graft.Staging.dirFor("retract-sh-acc")
    val idx = graft.Staging.dirFor("retract-sh-idx")
    val sdir = graft.Staging.dirFor("retract-sh-store")
    val corpus = Tables.documents(spark, sf001).filter($"doc_id" % 5 =!= 0)
    val batch = Tables.documents(spark, sf001).filter($"doc_id" % 5 === 0)
    // the gate sinks must exist for the sweep's positional args
    assert(IngestGate.gateBatch(
      Seq((900001L, mkText(1))).toDF("doc_id", "text"),
      0L, idx, acc, "doc_id", "text") == 1L)
    // two epochs: the base store, then an appended delta — the victim
    // is chosen from the DELTA so the base epoch must stay untouched
    Dedup.writeSimhashIndex(corpus.filter($"doc_id" % 2 === 0),
      "doc_id", "text", sdir)
    Dedup.appendSimhashIndexEpoch(corpus.filter($"doc_id" % 2 =!= 0),
      "doc_id", "text", sdir, epoch = 1L)
    def probe() = Dedup.newVsCorpusSimhash(spark, sdir, batch,
        "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val before = probe()
    val victim = before.collectFirst { case (_, id2, _) if id2 % 2 != 0 => id2 }
      .getOrElse(fail("need a matched corpus doc in the delta epoch"))
    val epoch0Files = fileSet(s"$sdir/blocks/batch=0")
    Retraction.retractAll(spark, Seq(victim), "doc_id", acc, idx,
      simhashDir = Some(sdir))
    // the forgotten doc left EVERY block slice, so no arrival can match it
    assert(spark.read.parquet(s"$sdir/blocks")
      .filter($"id" === victim).isEmpty)
    val after = probe()
    assert(after == before.filterNot(_._2 == victim),
      "post-sweep probe ≡ the probe against a store without the victim")
    assert(fileSet(s"$sdir/blocks/batch=0") == epoch0Files,
      "the epoch without victim rows must keep its exact files")
    // idempotent: a second sweep rewrites nothing
    val files = fileSet(s"$sdir/blocks")
    Retraction.retractAll(spark, Seq(victim), "doc_id", acc, idx,
      simhashDir = Some(sdir))
    assert(fileSet(s"$sdir/blocks") == files, "re-retracting must be a no-op")
  }
}
