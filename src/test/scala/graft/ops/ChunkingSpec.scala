package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Context-window chunking ([[Chunking]]): the window-start contract
  * on crafted token counts (overlap, redundant-tail drop, gap strides,
  * short docs), full-coverage property, hash portability across docs,
  * and the zero-shuffle plan gate. Cross-engine replay is the
  * `text_chunk` oracle. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int, id: Long = 1L) =
    Seq((id, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")

  private def windows(n: Int, size: Int, stride: Int): Seq[(Long, Long, Long)] =
    Chunking.chunk(doc(n), "doc_id", "text", size, stride)
      .orderBy("chunk_idx")
      .select("chunk_idx", "tok_start", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq

  test("overlapping windows: full-size bodies, short tail, redundant tail dropped") {
    // n=10, size=8, stride=4: naive starts {0,4,8} but [8,10) ⊆ [4,10)
    // adds no new tokens — the contract drops it.
    assert(windows(10, 8, 4) == Seq((0L, 0L, 8L), (1L, 4L, 6L)))
    // n=13: start 8's window [8,13) reaches past [4,12) — kept.
    assert(windows(13, 8, 4) == Seq((0L, 0L, 8L), (1L, 4L, 8L), (2L, 8L, 5L)))
  }

  test("gap stride (stride > size) samples without emitting empty windows") {
    // n=10, size=2, stride=5: a naive upper bound n−size+stride−1 = 12
    // would admit start 10 — an EMPTY window; the n−1 clamp forbids it.
    assert(windows(10, 2, 5) == Seq((0L, 0L, 2L), (1L, 5L, 2L)))
    // n=11 legitimately has a 1-token window at start 10.
    assert(windows(11, 2, 5) == Seq((0L, 0L, 2L), (1L, 5L, 2L), (2L, 10L, 1L)))
  }

  test("docs shorter than the window yield exactly one full-doc chunk") {
    assert(windows(3, 8, 4) == Seq((0L, 0L, 3L)))
  }

  test("stride ≤ size covers every token exactly (no holes)") {
    val ws = windows(23, 8, 6)
    assert(ws == Seq((0L, 0L, 8L), (1L, 6L, 8L), (2L, 12L, 8L), (3L, 18L, 5L)))
    val covered = ws.flatMap { case (_, st, nt) => st until (st + nt) }.toSet
    assert(covered == (0L until 23L).toSet, "every token index in some chunk")
  }

  test("identical window text hashes identically across documents") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f")).toDF("doc_id", "text")
    val hs = Chunking.chunk(docs, "doc_id", "text", size = 6, stride = 6)
      .select("chunk_hash").as[Long].collect()
    assert(hs.length == 2 && hs.distinct.length == 1,
      "chunk hash is a pure function of window text — cross-doc chunk dedup joins on it")
  }

  test("null and token-free documents produce no chunks") {
    val docs = Seq((1L, "a b"), (2L, null), (3L, "   ")).toDF("doc_id", "text")
    val ids = Chunking.chunk(docs, "doc_id", "text", 4, 4)
      .select("id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }

  private def md5_60(s: String): Long =
    Seq(s).toDF("t").select(Dedup.md5TokenHash60(col("t"))).as[Long].head()

  test("scrubRepeatedSpans drops cross-doc boilerplate, keeps unique content, rebuilds in order") {
    val docs = Seq(
      (1L, "h1 h2 h3 h4 a b c d"),  // header + unique body
      (2L, "h1 h2 h3 h4 e f g h"),  // same header, different body
      (3L, "x y z w"),              // untouched
      (4L, "h1 h2 h3 h4"),          // all boilerplate → empty
      (5L, "h1 h2 h3 h4 t1 t2")     // partial-tail span survives
    ).toDF("doc_id", "text")
    val r = Chunking.scrubRepeatedSpans(docs, "doc_id", "text", span = 4, maxDf = 1L)
      .orderBy("id")
      .as[(Long, Long, Long, Int, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 2L, 1L, 4, md5_60("a b c d")),
      (2L, 2L, 1L, 4, md5_60("e f g h")),
      (3L, 1L, 1L, 4, md5_60("x y z w")),
      (4L, 1L, 0L, 0, md5_60("")),
      (5L, 2L, 1L, 2, md5_60("t1 t2"))))
  }

  test("scrubRepeatedSpans with maxDf=2 tolerates pairs, still removes 3-way spans") {
    val docs = Seq(
      (1L, "p q r s"), (2L, "p q r s"), (3L, "p q r s"), // df=3 → dropped
      (4L, "u v w x"), (5L, "u v w x")                   // df=2 → kept
    ).toDF("doc_id", "text")
    val kept = Chunking.scrubRepeatedSpans(docs, "doc_id", "text", span = 4, maxDf = 2L)
      .select("id", "n_kept").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }

  test("a window-straddling repeat escapes scrubRepeatedSpans but NOT scrubRepeatedSubstrings") {
    // one 10-token passage shared verbatim at DIFFERENT offsets: 4 in
    // doc 1, 0 in doc 2 — so no disjoint 8-token window has the same
    // content in both docs (doc 1 grid: [0,8),[8,16); doc 2: [0,8),
    // [8,13)), exactly the boilerplate-behind-a-variable-prefix case
    val passage = (0 until 10).map(i => s"P$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $passage z1 z2"),
      (2L, s"$passage b1 b2 b3")).toDF("doc_id", "text")
    val old = Chunking.scrubRepeatedSpans(docs, "doc_id", "text",
        span = 8, maxDf = 1L)
      .select("id", "n_spans", "n_kept").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(old == Map(1L -> ((2L, 2L)), 2L -> ((2L, 2L))),
      "the disjoint form must PROVABLY miss the straddling repeat (keeps every span)")
    // the offset-free form: the passage's three 8-grams (relative
    // starts 0,1,2) repeat, their coverage union is the whole passage
    val got = Chunking.scrubRepeatedSubstrings(docs, "doc_id", "text",
        minLen = 8)
      .orderBy("id").as[(Long, Int, Long, Int, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 16, 3L, 6, md5_60("a1 a2 a3 a4 z1 z2")),
      (2L, 13, 3L, 3, md5_60("b1 b2 b3"))),
      s"straddling repeat must be scrubbed exactly, got ${got.mkString(", ")}")
  }

  test("scrubRepeatedSubstrings catches WITHIN-document repeats (occurrences, not doc-df)") {
    val block = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, s"$block x $block")).toDF("doc_id", "text")
    val got = Chunking.scrubRepeatedSubstrings(docs, "doc_id", "text",
        minLen = 8)
      .as[(Long, Int, Long, Int, Long)].collect().head
    assert(got == ((1L, 17, 2L, 1, md5_60("x"))),
      s"both occurrences of the self-repeated block must go, got $got")
  }

  test("coverage property: scrubRepeatedSubstrings ≡ brute-force Lee semantics on random corpora") {
    // brute force: every sliding L-gram string, corpus-wide occurrence
    // counts, covered = union of [s, s+L) over repeated starts — the
    // definitionally-exact form the operator must reproduce
    def brute(docs: Seq[(Long, String)], l: Int, maxOcc: Long)
        : Map[Long, (Int, Long, Int, String)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toVector }
      val occ = toks.flatMap { case (_, ts) =>
        (0 to ts.length - l).map(s => ts.slice(s, s + l).mkString(" ")) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      toks.filter(_._2.nonEmpty).map { case (id, ts) =>
        val starts = (0 to ts.length - l)
          .filter(s => occ(ts.slice(s, s + l).mkString(" ")) > maxOcc)
        val covered = starts.flatMap(s => s until s + l).toSet
        val clean = ts.indices.filterNot(covered).map(ts)
        id -> ((ts.length, starts.size.toLong, clean.size, clean.mkString(" ")))
      }.toMap
    }
    val rnd = new scala.util.Random(1014L)
    // tiny vocab forces plenty of accidental repeats at L=5; lengths
    // span below/at/above L; one token-free doc pins the exclusion
    val docs = (1L to 25L).map(id => id ->
      (0 until rnd.nextInt(30)).map(_ => s"v${rnd.nextInt(4)}").mkString(" ")) :+
      (99L -> "   ")
    for (maxOcc <- Seq(1L, 2L)) {
      val want = brute(docs, l = 5, maxOcc)
      val got = Chunking.scrubRepeatedSubstrings(
          docs.toDF("doc_id", "text"), "doc_id", "text",
          minLen = 5, maxOcc = maxOcc)
        .as[(Long, Int, Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got.keySet == want.keySet,
        s"maxOcc=$maxOcc: doc set (token-free excluded) must match")
      want.foreach { case (id, (n, nrep, nclean, cleanText)) =>
        assert(got(id) == ((n, nrep, nclean, md5_60(cleanText))),
          s"maxOcc=$maxOcc doc $id: got ${got(id)}, want ($n,$nrep,$nclean,${cleanText.take(60)})")
      }
    }
  }

  test("incremental substring scrub ≡ full scrub restricted to the batch; replay-idempotent; catches history↔batch repeats") {
    val rnd = new scala.util.Random(1015L)
    val all = (1L to 30L).map(id => id ->
      (0 until (5 + rnd.nextInt(25))).map(_ => s"w${rnd.nextInt(4)}").mkString(" "))
    // plant a cross-boundary repeat at DIFFERENT offsets: history doc
    // 101 carries the passage mid-doc, batch doc 102 leads with it
    val passage = (0 until 9).map(i => s"X$i").mkString(" ")
    val hist = all.filter(_._1 % 3 != 0) :+ (101L -> s"a b c $passage")
    val batch = all.filter(_._1 % 3 == 0) :+ (102L -> s"$passage y z")
    val idx = graft.Staging.dirFor("chunk-inc-idx")
    Chunking.writeGramEpoch(hist.toDF("doc_id", "text"), "doc_id", "text",
      minLen = 5, idx, batchId = 0L)
    val inc = Chunking.scrubIncremental(batch.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 5, idx, maxOcc = 1L,
        appendBatchId = Some(1L))
      .as[(Long, Int, Long, Int, Long)].collect().sortBy(_._1).toSeq
    // the oracle relation: the FULL scrub over history ∪ batch, batch rows
    val full = Chunking.scrubRepeatedSubstrings(
        (hist ++ batch).toDF("doc_id", "text"), "doc_id", "text", minLen = 5)
      .as[(Long, Int, Long, Int, Long)].collect()
      .filter(r => batch.exists(_._1 == r._1)).sortBy(_._1).toSeq
    assert(inc == full,
      "incremental verdicts must equal the full scrub's for the batch docs")
    // the planted cross-boundary straddle was caught: doc 102 lost
    // exactly the 9 passage tokens
    val d102 = inc.find(_._1 == 102L).get
    assert(d102._2 - d102._4 >= 9,
      s"history↔batch repeat must be scrubbed from the batch doc: $d102")
    // replay with the SAME batch id: identical output (own epoch excluded
    // from the history sum — no double counting)
    val replay = Chunking.scrubIncremental(batch.toDF("doc_id", "text"),
        "doc_id", "text", minLen = 5, idx, maxOcc = 1L,
        appendBatchId = Some(1L))
      .as[(Long, Int, Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(replay == inc, "an epoch replay must not change any verdict")
  }

  test("span-level decontamination scrubs exactly the shared span and KEEPS the doc the doc-level filter drops") {
    val quote = (0 until 7).map(i => s"Q$i").mkString(" ")
    val bench = Seq((1000L, s"prompt $quote answer")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"long unique body one $quote trailing text"),  // quotes the benchmark mid-doc
      (2L, "completely clean document body"),
      (3L, quote)                                          // IS the benchmark passage
    ).toDF("doc_id", "text")
    val got = Chunking.scrubContaminatedSpans(corpus, "doc_id", "text",
        bench, "doc_id", "text", minLen = 5)
      .orderBy("id").as[(Long, Int, Long, Int, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 13, 3L, 6, md5_60("long unique body one trailing text")),
      (2L, 4, 0L, 4, md5_60("completely clean document body")),
      (3L, 7, 3L, 0, md5_60(""))),
      s"surgical scrub: only the shared span goes, rows survive — got $got")
    // contrast: the doc-level filter throws doc 1's unique body away
    // with the quote (and doc 3, correctly); same n-gram length
    val dropped = Curation.decontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(dropped == Set(2L),
      "doc-level decontaminate keeps only the clean doc — the span form preserves doc 1's 4 unique tokens")
    // verdict parity on ≥ minLen docs: contaminated ⇔ dropped
    val verdicts = got.map(r => r._1 -> (r._3 > 0)).toMap
    assert(verdicts.forall { case (id, contaminated) =>
      contaminated == !dropped.contains(id) },
      "span-form contamination verdict must agree with the doc-level filter")
  }

  test("streaming twin: chunking a document stream matches the batch result") {
    // Chunking is stateless per document, so the SAME operator runs
    // unchanged inside a streaming query — no watermark, no state
    // store; each micro-batch chunks its own documents.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val chunked = Chunking.chunk(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", size = 8, stride = 6)
    val q = chunked.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("chunk_stream").start()
    try {
      mem.addData((1L, (1 to 23).map(i => s"t$i").mkString(" ")))
      q.processAllAvailable()
      mem.addData((2L, "a b c"))
      q.processAllAvailable()
      val got = spark.table("chunk_stream")
        .select("id", "chunk_idx", "tok_start", "n_tokens", "chunk_hash")
        .as[(Long, Long, Long, Int, Long)].collect().toSet
      val batch = Chunking.chunk(
        Seq((1L, (1 to 23).map(i => s"t$i").mkString(" ")), (2L, "a b c"))
          .toDF("doc_id", "text"), "doc_id", "text", size = 8, stride = 6)
        .as[(Long, Long, Long, Int, Long)].collect().toSet
      assert(got == batch, "stream chunks must equal batch chunks")
    } finally q.stop()
  }

  test("plan: chunking is a narrow, shuffle-free projection") {
    val p = Chunking.chunk(doc(50), "doc_id", "text", 32, 24)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"chunking must be embarrassingly parallel — zero exchanges:\n$p")
  }

  test("paragraph dedup: keep-first corpus-wide, ordered reassembly, fully-deduped docs stay in the census") {
    import spark.implicits._
    // 4-token window; doc 1 repeats doc 0's first block and has its own
    // tail; doc 2 is doc 0 verbatim (loses everything); doc 3 unrelated
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d x y z w"),
      (2L, "a b c d e f g h"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val out = Chunking.dedupParagraphs(docs, "doc_id", "text", window = 4)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 2L, "a b c d e f g h"),
      (1L, 2L, 1L, "x y z w"),
      (2L, 2L, 0L, ""),
      (3L, 1L, 1L, "p q r s")), out.toString)
    // KEEP-FIRST vs the substring scrub's REMOVE-ALL: doc 0 keeps the
    // shared block the scrub would strip from every copy
    val scrubbedClean = Chunking.scrubRepeatedSubstrings(docs, "doc_id", "text",
        minLen = 4)
      .filter($"id" === 0L).select("n_tokens_clean").as[Int].collect().head
    assert(scrubbedClean < 8,
      s"scrub removes all copies — including doc 0's: $scrubbedClean tokens kept")
    // an intra-doc repeated block also collapses to its first position
    val intra = Seq((7L, "a b c d a b c d e f g h")).toDF("doc_id", "text")
    val one = Chunking.dedupParagraphs(intra, "doc_id", "text", window = 4)
      .as[(Long, Long, Long, String)].collect().head
    assert(one == ((7L, 3L, 2L, "a b c d e f g h")), one.toString)
    // deterministic
    val again = Chunking.dedupParagraphs(docs, "doc_id", "text", window = 4)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(again == out)
  }
}
