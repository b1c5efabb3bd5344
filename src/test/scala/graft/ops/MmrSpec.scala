package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** MMR diversity re-rank ([[Retrieval.mmr]]): the hand case where the
  * similarity penalty flips pure-relevance order, the λ = 1 identity,
  * short-candidate exhaustion, and real-corpus determinism. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private val cands =
    Seq((1L, 0.9), (2L, 0.85), (3L, 0.5)).toDF("id", "rel")
  // 1 and 2 are near-duplicates; 3 is different material
  private val sims =
    Seq((1L, 2L, 0.95), (1L, 3L, 0.1), (2L, 3L, 0.1))
      .toDF("id1", "id2", "sim")

  test("hand case: the near-dup of the top pick defers behind diverse material") {
    val out = Retrieval.mmr(cands, sims, k = 3, lambda = 0.7)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    // pure relevance would give 1, 2, 3; MMR gives 1, 3, 2:
    //   pick 1 (0.7*0.9), then 2 scores 0.7*0.85-0.3*0.95 = 0.31
    //   while 3 scores 0.7*0.5-0.3*0.1 = 0.32
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(math.abs(out(0)._4 - 0.63) < 1e-9)
    assert(math.abs(out(1)._4 - 0.32) < 1e-9)
    assert(math.abs(out(2)._4 - 0.31) < 1e-9)
    // rel rides through unchanged
    assert(out.map(_._3).toSeq == Seq(0.9, 0.5, 0.85))
  }

  test("lambda = 1 is pure relevance order (ties by id)") {
    val out = Retrieval.mmr(cands, sims, k = 3, lambda = 1.0)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_._4).toSeq == Seq(0.9, 0.85, 0.5))
  }

  test("k beyond the shortlist exhausts it with contiguous ranks") {
    val out = Retrieval.mmr(cands, sims, k = 10, lambda = 0.7)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("real corpus: deterministic across runs, ranks well-formed, penalty actually bites") {
    def run() = {
      val emb = Tables.embeddings(spark, sf001)
      val qv = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
      val corpus = emb.filter($"vec_id" >= 5)
        .select($"vec_id".as("id"), $"embedding".as("vec"))
      val scored = corpus.crossJoin(broadcast(qv))
        .select(lit(0).as("qid"), $"id", $"vec",
          round(Similarity.cosine($"vec", $"qvec"), 4).as("rel"))
      val top = Skew.saltedTopK(scored, Seq("qid"),
        Seq($"rel".desc, $"id".asc), 20, saltBy = $"id")
      val pw = Retrieval.pairwiseSims(top.select($"id", $"vec"))
      Retrieval.mmr(top.select($"id", $"rel"), pw, k = 10, lambda = 0.7)
        .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    }
    val a = run()
    assert(a == run(), "greedy fold must be deterministic")
    assert(a.map(_._1) == (1 to 10))
    assert(a.map(_._2).distinct.length == 10)
    // diversification reorders relative to pure relevance on this
    // corpus (the committed sf0.001 answer does — pin the PROPERTY,
    // not the ids)
    val byRel = a.sortBy(r => (-r._3, r._2)).map(_._2)
    assert(a.map(_._2) != byRel,
      "MMR order should differ from pure relevance order here")
  }
}
