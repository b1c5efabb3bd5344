package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CCNet perplexity bucketing ([[LanguageModel.perplexityBuckets]]):
  * equal-population cuts, by-value tie semantics, determinism, and the
  * composed head/middle/tail split on the real corpus. */
class PplBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: 9 docs split 3/3/3, bands monotone in nll") {
    val ppl = (1 to 9).map(i => (i.toLong, i * 1.0)).toDF("id", "nll")
    val out = LanguageModel.perplexityBuckets(ppl, bands = 3)
      .select("id", "band", "tier").as[(Long, Int, String)]
      .collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(0, 0, 0, 1, 1, 1, 2, 2, 2))
    assert(out.map(_._3).distinct.toSeq == Seq("head", "middle", "tail"))
  }

  test("ties at a cut all land in the LOWER band (by-value assignment)") {
    // 9 docs, nll = 1,2,2,2,3,4,5,6,7: the 1/3 cut needs cum ≥ 3,
    // which the tie block at 2.0 crosses (cum 4) — so ALL THREE 2.0
    // ties join the head (4 members), and the later cuts shift:
    // c2 = 4.0 (cum 6), middle = {3,4}, tail = {5,6,7}
    val ppl = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "nll")
    val out = LanguageModel.perplexityBuckets(ppl, bands = 3)
      .select("nll", "band").as[(Double, Int)].collect().toSet
    assert(out == Set((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1),
      (5.0, 2), (6.0, 2), (7.0, 2)), out.toString)
    // degenerate tie mass swallowing BOTH cuts collapses the middle
    // band entirely — by-value semantics, never an error
    val deg = Seq(1.0, 1.0, 1.0, 1.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "nll")
    val dout = LanguageModel.perplexityBuckets(deg, bands = 3)
      .select("nll", "band").as[(Double, Int)].collect().toSet
    assert(dout == Set((1.0, 0), (2.0, 2), (3.0, 2)), dout.toString)
  }

  test("composed CCNet split on the real corpus: ~n/3 per tier, ordered by nll") {
    val ppl = LanguageModel.perplexityKnVsSlice(
      graft.Tables.documents(spark, sf001), "doc_id", "text",
      col("lang") === "en")
    val out = LanguageModel.perplexityBuckets(ppl, bands = 3).persist()
    val n = out.count()
    val sizes = out.groupBy("band").count().orderBy("band")
      .select("count").as[Long].collect()
    assert(sizes.length == 3)
    // by-value cuts: each band within tie-mass of n/3 — generous bound
    sizes.foreach(s => assert(s > n / 6 && s < n / 2,
      s"band sizes far from equal-population: ${sizes.toSeq}"))
    // every head nll ≤ every middle nll ≤ every tail nll
    val maxByBand = out.groupBy("band").agg(max("nll").as("mx"), min("nll").as("mn"))
      .orderBy("band").select("mn", "mx").as[(Double, Double)].collect()
    assert(maxByBand(0)._2 <= maxByBand(1)._1 + 1e-9)
    assert(maxByBand(1)._2 <= maxByBand(2)._1 + 1e-9)
    // deterministic
    val again = LanguageModel.perplexityBuckets(ppl, bands = 3)
      .select("id", "band").as[(Long, Int)].collect().toSet
    assert(again == out.select("id", "band").as[(Long, Int)].collect().toSet)
  }

  test("bands=5 keeps numeric tiers and partitions the corpus") {
    val ppl = (1 to 20).map(i => (i.toLong, i * 0.5)).toDF("id", "nll")
    val out = LanguageModel.perplexityBuckets(ppl, bands = 5)
      .select("band", "tier").as[(Int, String)].collect()
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0, 1, 2, 3, 4))
    assert(out.forall(r => r._2 == r._1.toString))
  }
}
