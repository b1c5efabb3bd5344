package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextRank ([[TextRank.tokenRank]]): structural properties on crafted
  * graphs (symmetry, centrality, mass conservation) — the cross-engine
  * 10-iteration replay is the `text_rank` oracle. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(texts: String*): Map[String, Double] =
    TextRank.tokenRank(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text")
      .select("token", "r").as[(String, Double)].collect().toMap

  test("symmetric two-node graph splits rank evenly") {
    val r = ranksOf("a b a b a b")
    assert(r.keySet == Set("a", "b"))
    assert(r("a") == r("b"), s"symmetric nodes must tie: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-4, s"rank mass conserved: $r")
  }

  test("hub of a star outranks its leaves; leaves tie") {
    // hub adjacent to x/y/z, each leaf only to hub
    val r = ranksOf("x hub y", "z hub x", "y hub z")
    assert(r("hub") > r("x"), s"hub must dominate: $r")
    assert(r("x") == r("y") && r("y") == r("z"), s"symmetric leaves tie: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
  }

  test("self-adjacent repeats don't vote for themselves") {
    // "a a a a b": without self-loop removal, a's repeats would inflate a
    val r = ranksOf("a a a a b")
    assert(r.keySet == Set("a", "b"))
    assert(r("a") == r("b"),
      s"the only real edge is a–b, so both ends must tie: $r")
  }

  test("rank is partitioning-invariant after rounding") {
    val docs = (1 to 50).map(i => (i.toLong, s"w$i w${i % 7} shared w${i % 3}"))
      .toDF("doc_id", "text")
    val one = TextRank.tokenRank(docs.coalesce(1), "text")
      .select("token", "r").as[(String, Double)].collect().toMap
    val many = TextRank.tokenRank(docs.repartition(5), "text")
      .select("token", "r").as[(String, Double)].collect().toMap
    assert(one == many, "6-dp rounding must absorb summation-order noise")
  }
}
