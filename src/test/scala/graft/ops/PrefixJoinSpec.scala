package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The prefix-filtered exact Jaccard join: losslessness vs the
  * brute-force all-pairs join, candidate-count reduction (the
  * sub-quadratic claim), and the threshold boundary. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with heavy shared boilerplate (stop-shingle skew — the
    * all-pairs killer), a planted near-dup pair, a planted exact dup,
    * and unrelated tails. */
  private def corpus: Seq[(Long, String)] = {
    val boiler = "terms of service apply to all users of this site"
    val tails = Seq(
      "quantum entanglement enables novel communication protocols",
      "the harvest festival begins after the autumn equinox",
      "distributed consensus requires a quorum of healthy replicas",
      "volcanic soil produces exceptionally robust coffee beans",
      "medieval manuscripts reveal trade routes across the steppe",
      "tidal forces gradually lock rotating moons to their planets")
    val docs = tails.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"$boiler $t")
    }
    val nearDup = (100L,
      "quantum entanglement enables novel communication protocols " +
      "quantum entanglement enables secure communication protocols")
    val nearDupTwin = (101L,
      "quantum entanglement enables novel communication protocols " +
      "quantum entanglement enables novel communication methods")
    val exactDup = (102L, docs.head._2)
    docs ++ Seq(nearDup, nearDupTwin, exactDup)
  }

  test("prefix join equals the brute-force join at every threshold tried") {
    val df = corpus.toDF("doc_id", "text")
    Seq(0.5, 0.6, 0.8).foreach { t =>
      val fast = Dedup.prefixJaccardJoin(df, "doc_id", "text", threshold = t)
        .select("id1", "id2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
      val brute = Dedup.jaccardPairs(df, "doc_id", "text")
        .filter(col("jaccard") >= t)
        .select("id1", "id2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
      assert(fast == brute, s"threshold $t: $fast vs $brute")
      assert(brute.nonEmpty, s"threshold $t must have planted matches")
    }
  }

  test("exact duplicate scores 1.0 and survives any threshold") {
    val df = corpus.toDF("doc_id", "text")
    val out = Dedup.prefixJaccardJoin(df, "doc_id", "text", threshold = 1.0)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 102L, 1.0)))
  }

  test("prefixes prune the candidate space the boilerplate would explode") {
    val df = corpus.toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3)
    val prefix = Dedup.rarityPrefix(sh, 0.6)
    def pairCount(rel: org.apache.spark.sql.DataFrame): Long =
      rel.as("a").join(rel.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
    val allPairs = pairCount(sh)
    val candPairs = pairCount(prefix.select(col("id"), col("shingle")))
    info(s"all-pairs candidates=$allPairs prefix candidates=$candPairs")
    // the boilerplate links EVERY original doc pair; rarity prefixes
    // must cut the candidate set to a fraction
    assert(candPairs * 3 <= allPairs,
      s"prefix filter must prune: $candPairs vs $allPairs")
  }

  test("prefix relation keeps exactly sz - ceil(t*sz) + 1 rarest shingles") {
    val df = Seq((1L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3) // 10 distinct 3-grams
    val n = Dedup.rarityPrefix(sh, 0.6).count()
    assert(n == 10 - 6 + 1, s"expected 5 prefix shingles, got $n")
  }
}
