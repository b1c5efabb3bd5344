package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Incremental simhash probe ([[Dedup.writeSimhashIndex]] +
  * [[Dedup.newVsCorpusSimhash]], the Manku-blocked scheme): losslessness
  * against the brute-force cross-split Hamming join at every permitted
  * radius, the planted exact-dup catch, block-key recombination, the
  * pigeonhole guard, and the on-disk block partitioning. */
class SimhashIncSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(dir: String, maxDist: Int) = {
    val corpus = Dedup.simhashSignatures(
      Tables.documents(spark, dir).filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", Dedup.md5TokenHash60, bits = 60)
      .select($"id".as("id2"), $"sig".as("sig2"))
    val batch = Dedup.simhashSignatures(
      Tables.documents(spark, dir).filter($"doc_id" % 5 === 0),
      "doc_id", "text", Dedup.md5TokenHash60, bits = 60)
      .select($"id".as("id1"), $"sig".as("sig1"))
    batch.crossJoin(corpus)
      .select($"id1", $"id2",
        Dedup.hamming($"sig1", $"sig2").cast("long").as("dist"))
      .filter($"dist" <= maxDist)
      .as[(Long, Long, Long)].collect().toSet
  }

  test("probe ≡ brute-force cross-split Hamming join at radii 0, 1, 3 (losslessness)") {
    val idx = graft.Staging.dirFor("simhash-inc-spec")
    Dedup.writeSimhashIndex(
      Tables.documents(spark, sf001).filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", idx)
    for (d <- Seq(0, 1, 3)) {
      val probed = Dedup.newVsCorpusSimhash(spark, idx,
          Tables.documents(spark, sf001).filter($"doc_id" % 5 === 0),
          "doc_id", "text", maxDist = d)
        .as[(Long, Long, Long)].collect().toSet
      assert(probed == bruteForce(sf001, d),
        s"blocked candidates must be lossless at maxDist=$d")
    }
  }

  test("planted pair: an arriving exact copy of stored content is caught at distance 0; unrelated text is not") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different material about distributed query engines and shuffles"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "unrelated arrival text mentioning neither foxes nor rivers at all today"))
      .toDF("doc_id", "text")
    val idx = graft.Staging.dirFor("simhash-inc-planted")
    Dedup.writeSimhashIndex(corpus, "doc_id", "text", idx)
    val hits = Dedup.newVsCorpusSimhash(spark, idx, batch, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(hits.contains((100L, 1L, 0L)), "exact copy must surface at distance 0")
    assert(!hits.exists(_._1 == 101L), "unrelated arrival must not match")
  }

  test("block keys recombine to the signature (shift/mask partition is exact)") {
    val sigs = Seq((1L, 0x0ABCDEF123456789L), (2L, -1L), (3L, 0L))
      .toDF("id", "sig")
    val w = 60 / 4
    val rows = Dedup.simhashBlocks(sigs.select($"id",
        $"sig".bitwiseAND(lit((1L << 60) - 1)).as("sig")), bits = 60, blocks = 4)
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.length == 12, "blocks rows = docs x blocks")
    rows.groupBy(_._3).foreach { case (_, blks) =>
      val sig = blks.head._4
      val rebuilt = blks.map { case (key, b, _, _) => key << (b * w) }
        .reduce(_ | _)
      assert(rebuilt == sig, "OR of shifted block keys must equal the signature")
    }
  }

  test("pigeonhole guard: maxDist >= blocks is rejected (losslessness would be silently lost)") {
    val idx = graft.Staging.dirFor("simhash-inc-guard")
    Dedup.writeSimhashIndex(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", idx)
    val batch = Seq((2L, "a b d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.newVsCorpusSimhash(spark, idx, batch, "doc_id", "text",
        blocks = 4, maxDist = 4)
    }
  }

  test("store layout: epoch directories with nested block partitions") {
    val idx = graft.Staging.dirFor("simhash-inc-layout")
    Dedup.writeSimhashIndex(
      Tables.documents(spark, sf001).filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", idx)
    val epochs = new java.io.File(s"$idx/blocks").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(epochs == Set("batch=0"))
    val dirs = new java.io.File(s"$idx/blocks/batch=0").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("b=0", "b=1", "b=2", "b=3"))
    // the store is ONE relation: the per-doc signature slice is b = 0
    val sigSlice = spark.read.parquet(s"$idx/blocks")
      .filter($"b" === 0).select("id").as[Long].collect()
    assert(sigSlice.length == sigSlice.distinct.length,
      "b=0 slice must hold exactly one row per doc")
  }

  test("rebuild clears stale epochs: writeSimhashIndex into a store holding epochs > 0 answers from the NEW corpus only") {
    val idx = graft.Staging.dirFor("simhash-inc-rebuild")
    val old1 = Seq((1L, "stale boilerplate page about foxes and rivers today")).toDF("doc_id", "text")
    val old2 = Seq((2L, "another stale epoch about query engines and shuffles")).toDF("doc_id", "text")
    Dedup.writeSimhashIndex(old1, "doc_id", "text", idx)
    Dedup.appendSimhashIndexEpoch(old2, "doc_id", "text", idx, epoch = 1L)
    // rebuild with a fresh corpus that shares nothing with the old one
    val fresh = Seq((10L, "entirely new corpus content concerning parquet row group statistics"))
      .toDF("doc_id", "text")
    Dedup.writeSimhashIndex(fresh, "doc_id", "text", idx)
    val stored = spark.read.parquet(s"$idx/blocks")
      .select("id").distinct().as[Long].collect().toSet
    assert(stored == Set(10L),
      s"rebuild must clear epochs from the prior store, found ids $stored")
    // an arriving copy of OLD content must no longer match anything
    val probe = Dedup.newVsCorpusSimhash(spark, idx,
        Seq((100L, "stale boilerplate page about foxes and rivers today"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    assert(probe.isEmpty, "stale epoch rows must not answer probes after a rebuild")
  }

  test("crash-safe rebuild swap: every interrupted-rebuild window leaves (or recovers to) a readable blocks tree") {
    import org.apache.hadoop.fs.Path
    val idx = graft.Staging.dirFor("simhash-inc-crash")
    val oldC = Seq((1L, "old corpus text about foxes and rivers near the bank"))
      .toDF("doc_id", "text")
    val newC = Seq((10L, "replacement corpus concerning parquet row group statistics"))
      .toDF("doc_id", "text")
    val fs = new Path(idx).getFileSystem(
      spark.sessionState.newHadoopConf())
    def storedIds() = spark.read.parquet(s"$idx/blocks")
      .select("id").distinct().as[Long].collect().toSet

    // window A — crash DURING the tmp write (partial tmp, live intact):
    // the live tree stays readable and the next rebuild converges
    Dedup.writeSimhashIndex(oldC, "doc_id", "text", idx)
    fs.mkdirs(new Path(s"$idx/.blocks-tmp/batch=0"))
    assert(storedIds() == Set(1L), "live tree must survive a partial tmp")
    Dedup.writeSimhashIndex(newC, "doc_id", "text", idx)
    assert(storedIds() == Set(10L))

    // window B — crash BETWEEN the renames (old parked aside, complete
    // tmp, NO live tree): recovery renames the complete tmp in, so a
    // probe never sees a missing blocks tree
    fs.rename(new Path(s"$idx/blocks"), new Path(s"$idx/.blocks-aside"))
    val donor = graft.Staging.dirFor("simhash-inc-crash-donor")
    Dedup.writeSimhashIndex(oldC, "doc_id", "text", donor)
    fs.rename(new Path(s"$donor/blocks"), new Path(s"$idx/.blocks-tmp"))
    Retraction.recoverTree(spark, idx, "blocks")
    assert(storedIds() == Set(1L),
      "recovery must land the complete tmp as the live tree")
    assert(!fs.exists(new Path(s"$idx/.blocks-aside")) &&
      !fs.exists(new Path(s"$idx/.blocks-tmp")))

    // window C — crash AFTER the swap landed (aside not yet dropped):
    // recovery keeps the new tree and drops the superseded aside
    fs.mkdirs(new Path(s"$idx/.blocks-aside/batch=0"))
    Retraction.recoverTree(spark, idx, "blocks")
    assert(storedIds() == Set(1L))
    assert(!fs.exists(new Path(s"$idx/.blocks-aside")))

    // window D — a crashed FIRST-EVER build (partial tmp, NO live, NO
    // aside) at a DIFFERENT epoch id: the rebuild must clobber the
    // stale tmp, not rename its partial epoch into the live store
    val idx2 = graft.Staging.dirFor("simhash-inc-crash-first")
    fs.mkdirs(new Path(s"$idx2/.blocks-tmp/batch=5"))
    Dedup.writeSimhashIndex(newC, "doc_id", "text", idx2, epoch = 0L)
    val batches = fs.listStatus(new Path(s"$idx2/blocks"))
      .map(_.getPath.getName).toSet
    assert(batches == Set("batch=0"),
      s"stale first-build tmp must never reach the live store: $batches")
    assert(spark.read.parquet(s"$idx2/blocks")
      .select("id").distinct().as[Long].collect().toSet == Set(10L))
  }

  test("cap-and-flag: the capped probe names exactly the planted mega-cluster's buckets and withholds its pairs; a loose cap changes nothing") {
    // mega-cluster: many exact copies in the store collide on EVERY
    // block; one normal near-pair elsewhere must be unaffected
    val boiler = "identical boilerplate footer text repeated across every mirror of the site"
    val store = (1L to 20L).map(i => (i, boiler)) :+
      (50L, "a singular document about distributed joins and skew salting")
    val batch = Seq(
      (100L, boiler),
      (101L, "a singular document about distributed joins and skew salting"))
    val idx = graft.Staging.dirFor("simhash-inc-capped")
    Dedup.writeSimhashIndex(store.toDF("doc_id", "text"), "doc_id", "text", idx)
    val uncapped = Dedup.newVsCorpusSimhash(spark, idx,
        batch.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    // tight cap: each boilerplate block bucket projects 1 x 20 pairs
    val (pairsDf, overflowDf) = Dedup.newVsCorpusSimhashCapped(spark, idx,
      batch.toDF("doc_id", "text"), "doc_id", "text", maxPairsPerBucket = 5L)
    val pairs = pairsDf.as[(Long, Long, Long)].collect().toSet
    val overflow = overflowDf.as[(Int, Long, Long)].collect()
    assert(overflow.nonEmpty, "the planted mega-cluster must be flagged")
    assert(overflow.forall(_._3 == 20L),
      "overflow rows must carry the projected pair count")
    assert(!pairs.exists(_._1 == 100L),
      "pairs whose every shared block overflows are withheld")
    assert(pairs.contains((101L, 50L, 0L)),
      "the normal near-pair must survive the cap untouched")
    // loose cap: lossless — identical to the uncapped probe, no flags
    val (loosePairs, looseOver) = Dedup.newVsCorpusSimhashCapped(spark, idx,
      batch.toDF("doc_id", "text"), "doc_id", "text",
      maxPairsPerBucket = 1000L)
    assert(loosePairs.as[(Long, Long, Long)].collect().toSet == uncapped,
      "a cap nothing exceeds must change nothing")
    assert(looseOver.collect().isEmpty)
  }

  test("epoch append: probe over base ∪ appended epoch ≡ probe over a rebuilt single store; replay idempotent") {
    val docs = Tables.documents(spark, sf001).filter($"doc_id" % 5 =!= 0)
    val base = docs.filter($"doc_id" % 2 === 0)
    val delta = docs.filter($"doc_id" % 2 =!= 0)
    val batch = Tables.documents(spark, sf001).filter($"doc_id" % 5 === 0)
    val inc = graft.Staging.dirFor("simhash-epoch-inc")
    val full = graft.Staging.dirFor("simhash-epoch-full")
    Dedup.writeSimhashIndex(base, "doc_id", "text", inc)
    Dedup.appendSimhashIndexEpoch(delta, "doc_id", "text", inc, epoch = 1L)
    Dedup.writeSimhashIndex(docs, "doc_id", "text", full)
    def probe(p: String) = Dedup.newVsCorpusSimhash(spark, p, batch,
      "doc_id", "text").as[(Long, Long, Long)].collect().toSet
    val appended = probe(inc)
    assert(appended == probe(full),
      "epoch-appended store must answer exactly like a rebuilt one")
    // a replayed append overwrites its own epoch, changing nothing
    Dedup.appendSimhashIndexEpoch(delta, "doc_id", "text", inc, epoch = 1L)
    assert(probe(inc) == appended, "replayed append must be idempotent")
  }
}
