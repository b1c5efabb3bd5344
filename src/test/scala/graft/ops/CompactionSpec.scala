package graft.ops

import graft.{SparkSpec, Tables}
import graft.streaming.IngestGate
import org.apache.spark.sql.functions._

/** Epoch compaction ([[Compaction]]): reads identical before/after,
  * epoch-directory count collapses to one, the stream keeps appending
  * afterwards, and NEW epochs stay replay-idempotent. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: IndexedSeq[String] = (0 until 150).map(i => s"c$i")
  private def mkText(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private def epochDirs(dir: String): Int =
    new java.io.File(dir).listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("batch="))

  test("compaction collapses epochs, preserves content + nested layout, and the gate continues") {
    val idx = graft.Staging.dirFor("compact-idx")
    val acc = graft.Staging.dirFor("compact-acc")
    val ann = graft.Staging.dirFor("compact-ann")
    val vecs = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    def doc(id: Long) = (id, mkText(id.toInt), vecs(id))
    val trainDf = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(trainDf, "id", "vec", k = 4)
    val cb = PqIndex.train(trainDf, "id", "vec", m = 4, k = 8)
    val annSink = Some(IngestGate.AnnSink(ann, "vec", cents, cb))
    (0 until 4).foreach { e =>
      val b = Seq(doc(e * 3 + 1L), doc(e * 3 + 2L)).toDF("doc_id", "text", "vec")
      IngestGate.gateBatch(b, e.toLong, idx, acc, "doc_id", "text", ann = annSink)
    }
    val before = spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
    val annBefore = spark.read.parquet(ann).select("id").as[Long].collect().toSet
    assert(epochDirs(acc) == 4 && epochDirs(ann) == 4)

    Compaction.compactAll(spark, acc, idx, maxEpochId = 3L, annDir = Some(ann))

    assert(epochDirs(acc) == 1 && epochDirs(idx) == 1 && epochDirs(ann) == 1)
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet == before)
    assert(spark.read.parquet(ann).select("id").as[Long].collect().toSet == annBefore)
    // nested cell layout survived: probes still partition-prune and answer
    val queries = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 100 && $"vec_id" < 102)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val probed = IvfPq.topK(spark, ann, queries, cents, cb,
      k = 3, nProbe = 4, shortlist = 64)
    assert(probed.count() > 0)
    assert(probed.queryExecution.executedPlan.toString.contains("PartitionFilters"))

    // the gate continues appending, and a NEW epoch replay stays idempotent
    val b9 = Seq(doc(30L), doc(31L)).toDF("doc_id", "text", "vec")
    assert(IngestGate.gateBatch(b9, 9L, idx, acc, "doc_id", "text", ann = annSink) == 2L)
    assert(IngestGate.gateBatch(b9, 9L, idx, acc, "doc_id", "text", ann = annSink) == 2L,
      "post-compaction epoch replay must not self-reject")
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      == before ++ Set(30L, 31L))
    // a near-dup of a COMPACTED doc is still rejected via the base index
    val dup = {
      val t = mkText(1).split(" "); t(10) = "EDITED"
      Seq((99L, t.mkString(" "), vecs(5L))).toDF("doc_id", "text", "vec")
    }
    assert(IngestGate.gateBatch(dup, 10L, idx, acc, "doc_id", "text", ann = annSink) == 0L,
      "compacted epochs must still gate near-dups")
  }

  test("compaction over a RESIDUAL-encoded ANN layout: probes identical, nested cells preserved, appends continue") {
    val ann = graft.Staging.dirFor("compact-res-ann")
    val emb = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(emb, "id", "vec", k = 4)
    val rcb = ResidualPq.trainCodebooks(emb, cents, m = 4, k = 8)
    (0 until 3).foreach { e =>
      ResidualPq.appendIndexEpoch(
        emb.filter($"id" % 3 === e), cents, rcb, ann, e.toLong)
    }
    assert(epochDirs(ann) == 3)
    val queries = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 100 && $"vec_id" < 103)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def probe() = ResidualPq.topK(spark, ann, queries, cents, rcb,
        k = 5, nProbe = 4, shortlist = Int.MaxValue)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val before = probe()

    Compaction.compactEpochs(spark, ann, maxEpochId = 2L,
      nestedPartCols = Seq("cell"))

    assert(epochDirs(ann) == 1)
    assert(probe() == before, "compaction must not change probe results")
    // frozen-quantizer appends keep landing after compaction
    val extra = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 40 && $"vec_id" < 45)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    ResidualPq.appendIndexEpoch(extra, cents, rcb, ann, 7L)
    assert(spark.read.parquet(ann).count() == 45)
    assert(probe().nonEmpty)
  }

  test("compaction over an IVF-SQ layout: probes identical, nested cells preserved, appends continue") {
    val ann = graft.Staging.dirFor("compact-sq-ann")
    val emb = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(emb, "id", "vec", k = 4)
    val b = IvfSq.trainBounds(emb, cents)
    (0 until 3).foreach { e =>
      IvfSq.appendIndexEpoch(
        emb.filter($"id" % 3 === e), cents, b, ann, e.toLong)
    }
    assert(epochDirs(ann) == 3)
    val queries = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 100 && $"vec_id" < 103)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def probe() = IvfSq.topK(spark, ann, queries, cents, b,
        k = 5, nProbe = 4, shortlist = Int.MaxValue)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val before = probe()

    Compaction.compactEpochs(spark, ann, maxEpochId = 2L,
      nestedPartCols = Seq("cell"))

    assert(epochDirs(ann) == 1)
    assert(probe() == before, "compaction must not change probe results")
    val extra = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 40 && $"vec_id" < 45)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    IvfSq.appendIndexEpoch(extra, cents, b, ann, 7L)
    assert(spark.read.parquet(ann).count() == 45)
    assert(probe().nonEmpty)
  }

  test("compaction over the graph-ANN serving index: served walk identical, nb buckets preserved, appends continue") {
    val acc = graft.Staging.dirFor("compact-graph-acc")
    val idx = graft.Staging.dirFor("compact-graph-idx")
    val gdir = graft.Staging.dirFor("compact-graph-store")
    val nodes = Tables.embeddings(spark, sf001).filter($"vec_id" >= 5 && $"vec_id" < 45)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = Tables.embeddings(spark, sf001).filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    // two epochs: base graph over the first 30 ids, append the rest
    val base = nodes.filter($"id" < 35)
    val g0 = NnDescent.knnGraph(base, k = 4, iters = 2)
    NnDescent.writeGraphIndex(g0, gdir, numBuckets = 8, epoch = 0L)
    val g1 = NnDescent.appendNodes(g0, nodes, nodes.filter($"id" >= 35),
      k = 4, iters = 2)
    NnDescent.appendGraphIndexEpoch(g1, gdir, epoch = 1L, numBuckets = 8)
    // a gate pair so compactAll has its mandatory sinks
    val docs = Seq((1L, mkText(1)), (2L, mkText(2))).toDF("doc_id", "text")
    graft.streaming.IngestGate.gateBatch(docs, 0L, idx, acc, "doc_id", "text")
    def serve() = NnDescent.searchGraphIndexed(spark, gdir, nodes, queries,
        k = 5, entries = 8, beam = 4, hops = 2, numBuckets = 8)
      .orderBy("qid", "rank").collect().toSeq
    val before = serve()
    assert(epochDirs(gdir) == 2)

    Compaction.compactAll(spark, acc, idx, maxEpochId = 1L,
      graphDir = Some(gdir))

    assert(epochDirs(gdir) == 1, "graph epochs must collapse to the base")
    assert(new java.io.File(s"$gdir/batch=-1").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("nb=")) > 0,
      "the nb= bucket level must survive compaction")
    assert(serve() == before, "the served walk must be identical after compaction")
    // appends continue on the compacted store
    NnDescent.appendGraphIndexEpoch(g1, gdir, epoch = 2L, numBuckets = 8)
    assert(serve() == before,
      "re-appending the same refreshed graph adds no edges (anti-joined) and changes nothing")
  }

  test("compaction over the epoch postings store: probe identical, nested tb preserved, appends continue") {
    val pidx = graft.Staging.dirFor("compact-postings-epochs")
    val docs = (1L to 30L).map(id => (id, mkText(id.toInt))).toDF("doc_id", "text")
    (0 until 3).foreach { e =>
      TextIndex.appendPostingsEpoch(
        docs.filter($"doc_id" % 3 === e), "doc_id", "text", pidx, e.toLong)
    }
    val terms = mkText(5).split("\\s+").distinct.take(5).toSeq
    val before = TextIndex.bm25TopKEpochs(spark, pidx, terms, k = 30)
      .collect().toSeq
    assert(epochDirs(s"$pidx/postings") == 3 && epochDirs(s"$pidx/estats") == 3)

    Compaction.compactEpochs(spark, s"$pidx/postings", maxEpochId = 2L,
      nestedPartCols = Seq("tb"))
    Compaction.compactEpochs(spark, s"$pidx/estats", maxEpochId = 2L)

    assert(epochDirs(s"$pidx/postings") == 1 && epochDirs(s"$pidx/estats") == 1)
    assert(new java.io.File(s"$pidx/postings/batch=-1").listFiles()
      .filter(_.isDirectory).forall(_.getName.startsWith("tb=")),
      "the nested tb layout must survive compaction")
    assert(TextIndex.bm25TopKEpochs(spark, pidx, terms, k = 30)
      .collect().toSeq == before,
      "a compacted store must answer byte-identically")
    // appends continue after compaction and stay exact
    TextIndex.appendPostingsEpoch(
      Seq((100L, mkText(5))).toDF("doc_id", "text"), "doc_id", "text",
      pidx, epoch = 9L)
    val withNew = TextIndex.bm25TopKEpochs(spark, pidx, terms, k = 31)
      .select("id").as[Long].collect().toSet
    assert(withNew.contains(100L), "post-compaction appends must rank")
  }

  test("checkpoint horizon: epochs above maxEpochId are never touched") {
    val acc = graft.Staging.dirFor("compact-horizon")
    (0 until 5).foreach { e =>
      Seq((e * 10L, s"epoch $e")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$acc/batch=$e")
    }
    val before = spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
    val filesAbove = new java.io.File(s"$acc/batch=4").listFiles().map(_.getName).toSet
    val n = Compaction.compactEpochs(spark, acc, maxEpochId = 2L)
    assert(n == 3, s"collapsed $n")
    assert(epochDirs(acc) == 3, "base + the two uncommitted epochs")
    assert(new java.io.File(s"$acc/batch=3").isDirectory)
    assert(new java.io.File(s"$acc/batch=4").listFiles().map(_.getName).toSet
      == filesAbove, "epochs above the horizon keep their exact files")
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet == before)
  }

  test("recovery repairs every crash window back to a readable layout") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())
    def mk(dirTag: String): (String, Set[Long]) = {
      val d = graft.Staging.dirFor(s"compact-crash-$dirTag")
      (0 until 3).foreach { e =>
        Seq((e.toLong, s"d$e")).toDF("doc_id", "text")
          .write.mode("overwrite").parquet(s"$d/batch=$e")
      }
      (d, Set(0L, 1L, 2L))
    }
    def ids(d: String) =
      spark.read.parquet(d).select("doc_id").as[Long].collect().toSet

    // window 1: crash during the temp write (partial temp, all epochs live)
    val (d1, want1) = mk("w1")
    fs.mkdirs(new Path(s"$d1/.compact-batch"))
    Compaction.recover(spark, d1)
    assert(ids(d1) == want1 && !new java.io.File(s"$d1/.compact-batch").exists())

    // window 2: crash between parking and base rename (complete temp,
    // epochs parked aside, base absent)
    val (d2, want2) = mk("w2")
    spark.read.parquet(d2).drop("batch")
      .write.mode("overwrite").parquet(s"$d2/.compact-batch")
    (0 until 3).foreach(e => fs.rename(new Path(s"$d2/batch=$e"),
      new Path(s"$d2/.compact-aside-batch-batch=$e")))
    Compaction.recover(spark, d2)
    assert(ids(d2) == want2, "temp promoted to base, no data lost")
    assert(new java.io.File(s"$d2/batch=-1").isDirectory)

    // window 3: crash after base rename, before aside cleanup
    val (d3, want3) = mk("w3")
    assert(Compaction.compactEpochs(spark, d3, maxEpochId = 2L) == 3)
    (0 until 2).foreach(e => // refabricate stale asides next to the live base
      Seq((90L + e, "stale")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$d3/.compact-aside-batch-batch=$e"))
    Compaction.recover(spark, d3)
    assert(ids(d3) == want3, "superseded asides dropped, base intact")
    assert(!new java.io.File(d3).listFiles()
      .exists(_.getName.startsWith(".compact-aside-")))
  }

  test("compaction over a simhash-gate store: gating decisions identical, appends continue") {
    val idx = graft.Staging.dirFor("compact-sh-idx")
    val acc = graft.Staging.dirFor("compact-sh-acc")
    def doc(id: Long) = (id, mkText(id.toInt))
    // three epochs of distinct content
    assert(graft.streaming.SimhashGate.gateBatch(
      Seq(doc(1L), doc(2L)).toDF("doc_id", "text"), 0L, idx, acc,
      "doc_id", "text") == 2L)
    assert(graft.streaming.SimhashGate.gateBatch(
      Seq(doc(10L)).toDF("doc_id", "text"), 1L, idx, acc,
      "doc_id", "text") == 1L)
    assert(graft.streaming.SimhashGate.gateBatch(
      Seq(doc(20L)).toDF("doc_id", "text"), 2L, idx, acc,
      "doc_id", "text") == 1L)
    val storeBefore = spark.read.parquet(idx).drop("batch")
      .as[(Long, Int, Long, Long)].collect().toSet
    Compaction.compactAll(spark, acc, idx, maxEpochId = 2L)
    assert(epochDirs(idx) == 1 && epochDirs(acc) == 1)
    assert(spark.read.parquet(idx).drop("batch")
      .as[(Long, Int, Long, Long)].collect().toSet == storeBefore,
      "compaction must not change a single block row")
    // the gate continues over the compacted store: a copy of epoch-0
    // content is still rejected, fresh content still passes
    assert(graft.streaming.SimhashGate.gateBatch(
      Seq((30L, mkText(1)), doc(40L)).toDF("doc_id", "text"), 3L, idx, acc,
      "doc_id", "text") == 1L)
    assert(spark.read.parquet(s"$acc/batch=3")
      .select("doc_id").as[Long].collect().toSeq == Seq(40L))
  }

  test("compaction over the simhash SERVING store: probe identical, nested blocks preserved, appends continue") {
    val acc = graft.Staging.dirFor("compact-shs-acc")
    val idx = graft.Staging.dirFor("compact-shs-idx")
    val sdir = graft.Staging.dirFor("compact-shs-store")
    // compactAll's positional gate sinks
    assert(IngestGate.gateBatch(
      Seq((800001L, mkText(2))).toDF("doc_id", "text"),
      0L, idx, acc, "doc_id", "text") == 1L)
    val corpus = Tables.documents(spark, sf001).filter($"doc_id" % 5 =!= 0)
    val batch = Tables.documents(spark, sf001).filter($"doc_id" % 5 === 0)
    Dedup.writeSimhashIndex(corpus.filter($"doc_id" % 2 === 0),
      "doc_id", "text", sdir)
    Dedup.appendSimhashIndexEpoch(corpus.filter($"doc_id" % 2 =!= 0),
      "doc_id", "text", sdir, epoch = 1L)
    def probe() = Dedup.newVsCorpusSimhash(spark, sdir, batch,
      "doc_id", "text").as[(Long, Long, Long)].collect().toSet
    val before = probe()
    Compaction.compactAll(spark, acc, idx, maxEpochId = 1L,
      simhashDir = Some(sdir))
    assert(epochDirs(s"$sdir/blocks") == 1)
    assert(new java.io.File(s"$sdir/blocks/batch=-1").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("b=")) == 4,
      "nested block partitions must survive compaction")
    assert(probe() == before, "compaction must not change a single answer")
    // appends continue above the compaction horizon
    Dedup.appendSimhashIndexEpoch(
      Seq((800002L, mkText(3))).toDF("doc_id", "text"),
      "doc_id", "text", sdir, epoch = 2L)
    assert(probe() == before, "an unrelated append changes no probe answer")
  }
}
