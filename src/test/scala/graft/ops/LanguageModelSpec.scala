package graft.ops

import graft.SparkSpec
import graft.ops.LanguageModel._
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed smoothed bigram NLL on a tiny reference") {
    // ref bigrams: "a b" (from both docs), "b a", "a c" → c12: (a,b)=2,
    // (b,a)=1, (a,c)=1; contexts: a=3, b=1; vocab {a,b,c} → V=3
    val ref = Seq("a b a b", "a c").toDF("text")
    val lm = trainBigramLm(ref, "text")
    assert(lm.vocab == 3L)
    val big = lm.bigrams.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))

    // score "a b c": bigrams (a,b) → -ln((2+1)/(3+3)) = ln 2;
    // (b,c) unseen, context b seen (c1=1) → -ln(1/(1+3)) = ln 4
    val scored = perplexity(Seq((1L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", lm).collect().head
    assert(scored.getLong(1) == 2L)
    val expected = math.rint(((math.log(2) + math.log(4)) / 2) * 1000) / 1000
    assert(scored.getDouble(2) == expected)

    // fully-unseen context: "z z" → -ln(1/(0+3)) = ln 3
    val oov = perplexity(Seq((2L, "z z")).toDF("doc_id", "text"),
      "doc_id", "text", lm).collect().head
    assert(oov.getDouble(2) == math.rint(math.log(3) * 1000) / 1000)
  }

  test("sub-2-token and null docs are absent; in-domain scores below OOV") {
    val ref = Seq("the cat sat on the mat", "the dog sat on the rug").toDF("text")
    val lm = trainBigramLm(ref, "text")
    val docs = Seq((1L, "the cat sat on the rug"), (2L, "qq ww ee rr tt yy"),
      (3L, "solo"), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = perplexity(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) < out(2L), s"in-domain ${out(1L)} should beat OOV ${out(2L)}")
  }

  test("scores are partitioning-invariant") {
    val ref = Seq("a b c a b d", "b c d a").toDF("text")
    val docs = (1L to 40L).map(i => (i, s"a b c d a ${"x " * (i % 5).toInt}b"))
      .toDF("doc_id", "text")
    val lm = trainBigramLm(ref, "text")
    val one = perplexity(docs.coalesce(1), "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val many = perplexity(docs.repartition(7), "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(one.sameElements(many))
  }

  test("context counts derive from the bigram relation (single text pass)") {
    val ref = Seq("w w v w").toDF("text")
    val lm = trainBigramLm(ref, "text")
    // c1(w) must equal Σ_w2 c12(w, ·) = 2 — the (w,w) and (w,v) bigrams —
    // not the raw token count 3 (the last token opens no bigram)
    val ctx = lm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx == Map("w" -> 2L, "v" -> 1L))
  }
}
