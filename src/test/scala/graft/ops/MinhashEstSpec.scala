package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** MinHash estimator audit ([[Dedup.minhashEstimates]] +
  * [[Dedup.minhashSignaturesPortable]]): exact-dup identity, the
  * agreement-count construction, portability of the signature path,
  * and the real-corpus error bound. */
class MinhashEstSpec extends SparkSpec {
  import spark.implicits._

  test("an exact duplicate pair estimates 1.0 with zero error") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, text), (2L, text),
      (3L, "completely different words in this unrelated document body"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashEstimates(df, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0, 1.0)),
      s"identical signatures must agree on every permutation: ${out.toSeq}")
  }

  test("est is the agreement count over 64 permutations (hand-joined)") {
    val df = Tables.documents(spark, sf001)
    val sigs = Dedup.minhashSignaturesPortable(df, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    val out = Dedup.minhashEstimates(df, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.nonEmpty, "the committed corpus has J >= 0.5 pairs")
    out.foreach { case (id1, id2, _, est) =>
      val agr = sigs(id1).zip(sigs(id2)).count { case (x, y) => x == y }
      assert(est == agr.toDouble / 64,
        s"pair ($id1,$id2): est $est vs hand count $agr/64")
    }
  }

  test("real corpus: the estimator tracks exact Jaccard within the binomial envelope") {
    val out = Dedup.minhashEstimates(Tables.documents(spark, sf001),
        "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double, Double)].collect()
    // 4·σ at J = 0.5, n = 64 is 0.25 — a per-pair deviation beyond
    // that means the permutations are broken, not unlucky
    out.foreach { case (id1, id2, jac, est) =>
      assert(math.abs(est - jac) <= 0.25,
        s"pair ($id1,$id2): |$est - $jac| outside the 4-sigma envelope")
    }
    // and the mean error is small (the estimator is unbiased)
    val meanErr = out.map(r => math.abs(r._4 - r._3)).sum / out.length
    assert(meanErr < 0.1, s"mean |est - jaccard| $meanErr too large")
  }

  test("portable signatures differ from the xxhash path only in the base hash (same shape, same determinism)") {
    val df = Tables.documents(spark, sf001).limit(50)
    val a = Dedup.minhashSignaturesPortable(df, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    val b = Dedup.minhashSignaturesPortable(df, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(a == b, "portable signatures must be deterministic")
    assert(a.values.forall(_.length == 64))
    assert(a.values.forall(_.forall(m => m >= 0 && m < 2147483647L)))
  }
}
