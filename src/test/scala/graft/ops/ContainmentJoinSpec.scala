package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The prefix-filtered exact CONTAINMENT join
  * ([[Dedup.prefixContainmentJoin]]): losslessness vs the brute-force
  * all-ordered-pairs join, the asymmetric quote case Jaccard cannot
  * express, and the threshold boundary. */
class ContainmentJoinSpec extends SparkSpec {
  import spark.implicits._

  /** A quoted passage (doc 1 fully embeds doc 0's text in a much
    * longer page), a partial quote, an exact dup, and unrelated docs. */
  private def corpus: Seq[(Long, String)] = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "intro paragraph about animals follows here " +
      "the quick brown fox jumps over the lazy dog tonight " +
      "and then a long discussion of canine behavior patterns " +
      "closes this article about domesticated animal instincts"),
    (2L, "the quick brown fox jumps over the lazy cat tonight"),
    (3L, "volcanic soil produces exceptionally robust coffee beans " +
      "across the equatorial highlands of three continents"),
    (4L, "the quick brown fox jumps over the lazy dog tonight"))

  private def bruteContainment(df: org.apache.spark.sql.DataFrame,
      t: Double): Set[(Long, Long, Double)] = {
    val sh = Dedup.shingleHashes(df, "doc_id", "text", 3)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), Seq("id1"))
      .select(col("id1"), col("id2"),
        (col("i").cast("double") / col("sz1")).as("containment"))
      .filter(col("containment") >= t)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("prefix-filtered join equals brute force at every threshold tried") {
    val df = corpus.toDF("doc_id", "text")
    Seq(0.5, 0.8, 1.0).foreach { t =>
      val fast = Dedup.prefixContainmentJoin(df, "doc_id", "text", t)
        .select("id1", "id2", "containment")
        .as[(Long, Long, Double)].collect().toSet
      val brute = bruteContainment(df, t)
      assert(fast == brute, s"threshold $t: $fast vs $brute")
      assert(brute.nonEmpty, s"threshold $t must have planted matches")
    }
  }

  test("the asymmetric quote case: contained scores 1.0 forward, low backward") {
    val df = corpus.toDF("doc_id", "text")
    val out = Dedup.prefixContainmentJoin(df, "doc_id", "text", 0.9)
      .select("id1", "id2", "containment")
      .as[(Long, Long, Double)].collect().toMap2
    assert(out((0L, 1L)) == 1.0, s"doc 0 is fully quoted inside doc 1: $out")
    assert(!out.contains((1L, 0L)),
      "the long page is NOT contained in the short quote")
    // Jaccard on the same pair sits far below any dedup threshold —
    // the relation containment exists to express
    val j = Dedup.jaccardPairs(df.filter(col("doc_id") <= 1), "doc_id", "text")
      .select("jaccard").as[Double].collect().head
    assert(j < 0.5, s"Jaccard hides the full quote: $j")
  }

  test("exact duplicates contain each other in BOTH directions") {
    val df = corpus.toDF("doc_id", "text")
    val out = Dedup.prefixContainmentJoin(df, "doc_id", "text", 1.0)
      .select("id1", "id2", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(out.contains((0L, 4L, 1.0)) && out.contains((4L, 0L, 1.0)))
    assert(out.contains((0L, 1L, 1.0)) && !out.exists(p => p._1 == 1L && p._2 == 0L))
  }

  test("real corpus: containment ⊇ jaccard matches at the same threshold (supersets included)") {
    val docs = graft.Tables.documents(spark, sf001)
    val cont = Dedup.prefixContainmentJoin(docs, "doc_id", "text", 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val jac = Dedup.prefixJaccardJoin(docs, "doc_id", "text", 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // J(A,B) ≥ t ⇒ C(A→B) ≥ t and C(B→A) ≥ t (intersection over a
    // superset of |A| and |B|), so every Jaccard pair appears in both
    // directions here
    jac.foreach { case (a, b) =>
      assert(cont.contains((a, b)) && cont.contains((b, a)),
        s"jaccard pair ($a,$b) missing from containment")
    }
    assert(cont.nonEmpty)
  }

  test("collapse: quotes fold into their pages, exact-dup sets keep the smallest id") {
    val df = corpus.toDF("doc_id", "text")
    val kept = Dedup.containmentCollapse(df, "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().toSet
    // 0 is quoted in 1 (dropped toward the larger page); 4 is an exact
    // dup of 0 — but 0 is already gone, and 4 is contained in 1 too,
    // so only the page and the unrelated docs survive
    assert(kept == Set(1L, 2L, 3L), kept.toString)
    // with only the exact-dup pair present, the smaller id survives
    val two = corpus.filter(d => d._1 == 0L || d._1 == 4L).toDF("doc_id", "text")
    val keptTwo = Dedup.containmentCollapse(two, "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTwo == Set(0L), keptTwo.toString)
    // unshingled docs always survive
    val withNull = corpus.toDF("doc_id", "text")
      .union(Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val keptNull = Dedup.containmentCollapse(withNull, "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(keptNull.contains(99L))
  }

  test("incremental probe ≡ full replay restricted to (batch → corpus); unseen-shingle batch docs are safe") {
    // planted history ↔ batch pair: the corpus holds the long page and
    // unrelated docs; the batch delivers the quote (fully contained in
    // the page), a partial overlap, and a doc of entirely UNSEEN
    // shingles (exercises the df=0 prefix path)
    val corpusDocs = corpus.filter(d => d._1 != 0L && d._1 != 4L)
      .toDF("doc_id", "text")
    val batch = Seq(
      (200L, "the quick brown fox jumps over the lazy dog tonight"),
      (201L, "entirely novel content about deep sea bioluminescence patterns"),
      (202L, corpus(3)._2)).toDF("doc_id", "text")
    val idx = graft.Staging.dirFor("containment-inc-spec")
    Dedup.writeContainmentIndex(corpusDocs, "doc_id", "text", idx)
    val index = spark.read.parquet(idx)
    Seq(0.5, 0.8, 1.0).foreach { t =>
      val inc = Dedup.newVsCorpusContainment(index, batch,
          "doc_id", "text", threshold = t)
        .select("id1", "id2", "containment")
        .as[(Long, Long, Double)].collect().toSet
      // full replay over corpus ∪ batch, restricted to cross-split
      val full = Dedup.prefixContainmentJoin(
          corpusDocs.union(batch), "doc_id", "text", t)
        .filter($"id1" >= 200L && $"id2" < 200L)
        .select("id1", "id2", "containment")
        .as[(Long, Long, Double)].collect().toSet
      assert(inc == full, s"threshold $t: $inc vs $full")
    }
    val at1 = Dedup.newVsCorpusContainment(index, batch,
        "doc_id", "text", threshold = 1.0)
      .select("id1", "id2", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(at1.contains((200L, 1L, 1.0)),
      s"the quote must be flagged as contained in the stored page: $at1")
    assert(at1.contains((202L, 3L, 1.0)), "exact re-delivery must score 1.0")
    assert(!at1.exists(_._1 == 201L), "unseen content must pass untouched")
  }

  private implicit class Pairs(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
