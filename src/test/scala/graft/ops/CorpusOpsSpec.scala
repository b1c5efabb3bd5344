package graft.ops

import graft.SparkSpec
import graft.queries.SparkEntryPlans
import org.apache.spark.sql.functions._

/** Round-8 corpus-operations family: repetition/quality gating,
  * PII scrubbing, benchmark decontamination, shard packing, and
  * temperature mix planning. Value assertions on crafted rows plus the
  * plan gates that carry the 100 TB claims (single scan, broadcast
  * probe side).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- repetitionStats ----------------

  test("repetitionStats: repeated bigram and stuttering trigram are measured exactly") {
    val docs = Seq(
      // "x y" appears 3 times in 5 bigrams (interleaved repeats)
      (1L, "x y x y x y"),
      // 20 distinct tokens, no repeated gram at all
      (2L, (1 to 20).map(i => s"t$i").mkString(" ")),
      // one token: no bigrams, kept out only by the length gate
      (3L, "solo")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    // doc 1: tokens = [x y x y x y], bigrams with multiplicity:
    //   "x y"×3, "y x"×2 → top 3/5; trigrams: "x y x"×2, "y x y"×2 →
    //   4 occurrences, 2 distinct → dup frac 0.5
    assert(r(0).getAs[Double]("top_bigram_frac") == 0.6)
    assert(r(0).getAs[Double]("dup_trigram_frac") == 0.5)
    assert(!r(0).getAs[Boolean]("keep"), "repetitive doc must be rejected")

    // doc 2: all grams unique → top bigram 1/19, zero dup trigrams;
    // 20 tokens ≥ minTokens, mean length 2.55 in band ⇒ kept
    assert(r(1).getAs[Double]("top_bigram_frac") == math.round(10000.0 / 19) / 10000.0)
    assert(r(1).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(r(1).getAs[Boolean]("keep"))

    // doc 3 survives explode_outer with zero fractions
    assert(r(2).getAs[Int]("n_tokens") == 1)
    assert(r(2).getAs[Double]("top_bigram_frac") == 0.0)
    assert(!r(2).getAs[Boolean]("keep"), "1 token < minTokens")
  }

  test("repetitionStats: keep gate boundaries (length, mean token length)") {
    val docs = Seq(
      (1L, (1 to 19).map(i => s"t$i").mkString(" ")), // 19 tokens: too short
      (2L, (1 to 25).map(i => s"t$i").mkString(" ")), // 25 varied tokens: kept
      (3L, (1 to 25).map(_ => "antidisestablishmentarianism9999")
        .zipWithIndex.map { case (w, i) => s"$w$i" }.mkString(" ")) // mean len > 12
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(!r(0).getAs[Boolean]("keep"))
    assert(r(1).getAs[Boolean]("keep"))
    assert(!r(2).getAs[Boolean]("keep"), "mean token length out of band")
  }

  test("text_gopher_quality plan: shuffle-free projection — one scan, zero hash exchanges") {
    val p = SparkEntryPlans.executedPlan(spark, "text_gopher_quality", sf001)
    assert(p.split("FileScan parquet").length - 1 == 1,
      s"repetition stats are per-row; one corpus scan:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-document signals must not shuffle (only the ORDER BY range exchange):\n$p")
    assert(p.contains("repetition_stats"),
      s"codegen'd expression must survive into the physical plan:\n$p")
  }

  test("text_html_extract plan: one binaryFile scan, zero hash exchanges, expression codegen'd") {
    val p = SparkEntryPlans.executedPlan(spark, "text_html_extract", sf001)
    assert(!p.contains("Exchange hashpartitioning"),
      s"extraction is per-row; only the ORDER BY range exchange may shuffle:\n$p")
    assert(p.contains("html_text"),
      s"codegen'd expression must survive into the physical plan:\n$p")
  }

  // ---------------- scrubPii ----------------

  test("scrubPii: redacts email, IPv4, long digit runs; counts match; idempotent") {
    val rows = Seq(
      (1L, "write to alice.smith+spam@sub.example.co.uk or bob@x.io today"),
      (2L, "server 192.168.001.255 and 10.0.0.1 responded"),
      (3L, "account 123456789 ref 98765432109876"),
      (4L, "short runs 12345678 stay; v1.2.3.4 is a dotted quad"),
      (5L, "nothing sensitive here")
    ).toDF("id", "t")
    val out = rows.select(col("id"),
        TextAnalysis.scrubPii(col("t")).as("s"),
        TextAnalysis.piiCounts(col("t")).as("c"))
      .orderBy("id").collect()

    assert(out(0).getAs[String]("s") == "write to <EMAIL> or <EMAIL> today")
    assert(out(1).getAs[String]("s") == "server <IP> and <IP> responded")
    assert(out(2).getAs[String]("s") == "account <NUM> ref <NUM>")
    // 8 digits: under the ≥9 threshold; "1.2.3.4" IS a dotted quad and
    // is scrubbed (the pattern is boundary-free by design — a version
    // string is indistinguishable from an IP without context)
    assert(out(3).getAs[String]("s") == "short runs 12345678 stay; v<IP> is a dotted quad")
    assert(out(4).getAs[String]("s") == "nothing sensitive here")

    val c0 = out(0).getStruct(2)
    assert(c0.getAs[Int]("n_email") == 2 && c0.getAs[Int]("n_ip") == 0)
    val c2 = out(2).getStruct(2)
    assert(c2.getAs[Int]("n_num") == 2)

    // idempotence: placeholders contain no digits or @, so re-scrubbing
    // the scrubbed column is the identity
    val once = rows.select(TextAnalysis.scrubPii(col("t")).as("s"))
    val twice = once.select(TextAnalysis.scrubPii(col("s")).as("s"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  // ---------------- decontaminate ----------------

  test("decontaminate: drops exactly the corpus docs sharing an n-gram with the bench set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),      // shares "quick brown fox" with bench
      (2L, "a completely different sentence here"),
      (3L, "lazy dogs sleep all day"),        // shares "lazy dogs sleep"
      (4L, "quick brown cats climb trees")    // bigram overlap only — 3-gram clean
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "benchmark says quick brown fox"),
      (101L, "do lazy dogs sleep much")
    ).toDF("doc_id", "text")
    val survivors = Curation.decontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L, 4L),
      s"docs 1 and 3 share a trigram with the eval set; got $survivors")
  }

  test("decontaminate: sub-n documents fall back to whole-text identity") {
    val corpus = Seq((1L, "tiny doc"), (2L, "other text")).toDF("doc_id", "text")
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    val survivors = Curation.decontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L),
      "an exact copy of a short bench doc must still be caught")
  }

  test("decontaminate plan: bench shingle set broadcasts — the corpus never shuffles for the probe") {
    val p = SparkEntryPlans.executedPlan(spark, "text_decontaminate", sf001)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"membership probe must be a broadcast semi-join:\n$p")
  }

  test("decontaminateBloom: row-identical to exact decontaminate, at production AND pathological fpp") {
    val docs = graft.Tables.documents(spark, sf001)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val exact = Curation.decontaminate(corpus, "doc_id", "text",
      bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    // fpp 0.5: the sketch is deliberately terrible — half of all clean
    // shingles leak through the pre-filter. The exact verify join must
    // absorb every false positive; only sketch SIZE may change.
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Curation.decontaminateBloom(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, fpp = fpp)
        .select("doc_id").as[Long].collect().toSet
      assert(got == exact, s"fpp=$fpp must not change the result")
    }
  }

  test("decontaminateBloom: the pre-filter prunes the candidate relation before the verify join") {
    val docs = graft.Tables.documents(spark, sf001)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val allShingles = Dedup.shingleHashes(corpus, "doc_id", "text", 3).count()
    // Exercise the PRODUCTION candidate stage (bloom at 1% fpp) and
    // check it keeps a small fraction of the corpus shingle volume —
    // the claim that makes the sketch worth building.
    val benchSh = Dedup.shingleHashes(bench, "doc_id", "text", 3)
      .select(col("shingle")).distinct()
    val candidates = Curation.bloomCandidates(
      corpus, "doc_id", "text", benchSh, n = 3, fpp = 0.01).count()
    assert(candidates < allShingles / 2,
      s"bloom pre-filter kept $candidates of $allShingles corpus shingles — not pruning")
  }

  // ---------------- packShards ----------------

  test("packShards: greedy streaming pack, overflow documents don't split") {
    val d = Seq(
      // group a, budget 100: docs 1(60) 2(60) 3(30) 4(80)
      //   priors: 0, 60, 120, 150 → shards 0, 0, 1, 1
      ("a", 1L, 60L), ("a", 2L, 60L), ("a", 3L, 30L), ("a", 4L, 80L),
      // group b: one 250-token doc overflows shard 0 alone; next doc
      //   lands in shard 2 (prior 250)
      ("b", 1L, 250L), ("b", 2L, 10L)
    ).toDF("source", "doc_id", "n_tokens")
    val out = Sampling.packShards(d, "doc_id", "source", "n_tokens", 100L)
      .select("source", "doc_id", "shard")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 2L)))
  }

  test("packShards: deterministic — re-run produces the identical manifest") {
    val d = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val a = Sampling.packShards(d, "doc_id", "source", "n_tokens", 500L)
      .select("source", "doc_id", "shard").collect().toSeq
    val b = Sampling.packShards(d, "doc_id", "source", "n_tokens", 500L)
      .select("source", "doc_id", "shard").collect().toSeq
    assert(a.toSet == b.toSet && a.nonEmpty)
  }

  test("packShardsGlobal: bucketed two-phase prefix sum ≡ one global window") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val bucketed = Sampling.packShardsGlobal(d, "doc_id", "n_tokens", 500L,
        bucketWidth = 64L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    // reference: the single-partition global window (fine at spec scale)
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val global = d.withColumn("_prior",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("shard", floor(col("_prior") / 500.0).cast("long"))
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(bucketed == global && bucketed.nonEmpty,
      "bucket order ≡ id order, so the two-phase result must equal the global window")
    assert(bucketed.values.max >= 2, "multiple shards at spec scale")
  }

  test("packShardsGlobal plan: the only single-partition exchange is over bucket totals") {
    val p = SparkEntryPlans.executedPlan(spark, "q_pack_global", sf001)
    assert(p.split("Exchange SinglePartition").length - 1 <= 1,
      s"the corpus must never be globally re-sorted — only the tiny bucket-totals " +
        s"relation may pass through a single partition:\n$p")
  }

  // ---------------- temperatureMix ----------------

  test("temperatureMix: sqrt flattening up-weights small sources; rates cap at 1") {
    val d = (Seq.fill(900)("big") ++ Seq.fill(100)("small") ++ Seq.fill(4)("tiny"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "source")
    val m = Sampling.temperatureMix(d, "source", budget = 500L)
      .orderBy("group").collect()
    val byGroup = m.map(r => r.getAs[String]("group") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("target"), r.getAs[Double]("rate"))).toMap
    // z = 30 + 10 + 2 = 42; targets = round(500·w)
    assert(byGroup("big") == ((900L, 357L, math.round(10000.0 * 357 / 900) / 10000.0)))
    assert(byGroup("small")._2 == 119L)
    assert(byGroup("tiny")._2 == 24L)
    // tiny: target 24 > n 4 → rate capped at 1.0
    assert(byGroup("tiny")._3 == 1.0)
    // natural share of 'small' is 10%; flattened plan asks for ~24%
    assert(byGroup("small")._2.toDouble / 500 > 0.2)
  }

  test("applyMixPlan: executes the plan's rates; samples nest in the budget") {
    val docs = graft.Tables.documents(spark, sf001)
    def sample(budget: Long) = {
      val plan = Sampling.temperatureMix(docs, "lang", budget)
      Sampling.applyMixPlan(docs, "doc_id", "lang", plan, "mixT")
        .select("doc_id").as[Long].collect().toSet
    }
    val small = sample(100L)
    val large = sample(300L)
    assert(small.nonEmpty && small.size < large.size)
    assert(small.subsetOf(large),
      "raising the budget only raises rates, and the md5-60 uniform nests in the rate")
  }

  test("temperatureMix: tau=1 is proportional (no flattening)") {
    val d = (Seq.fill(300)("x") ++ Seq.fill(100)("y"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "source")
    val m = Sampling.temperatureMix(d, "source", budget = 100L, tau = 1.0)
      .orderBy("group").collect()
    assert(m(0).getAs[Long]("target") == 75L && m(1).getAs[Long]("target") == 25L)
  }
}
