package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion ([[Hybrid]], RRF): the fusion formula on a
  * hand case, full-outer semantics for single-list docs, consensus
  * dominance, and the end-to-end hybrid over the real corpus. */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("RRF hand case: formula exact, consensus beats single-list, absent lists contribute zero") {
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rk")
    val vec = Seq((11L, 1L), (13L, 2L)).toDF("id", "rk")
    val out = Hybrid.rrfTopK(lex, vec, k = 10)
      .select("id", "rrf", "rk").as[(Long, Double, Long)]
      .collect().sortBy(_._3)
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    // 11 is in BOTH lists (rank 2 + rank 1) and must fuse highest
    assert(out.head._1 == 11L)
    assert(out.head._2 == r(1.0 / 62 + 1.0 / 61))
    val m = out.map(o => o._1 -> o._2).toMap
    assert(m(10L) == r(1.0 / 61), "lex-only doc scores its one term")
    assert(m(13L) == r(1.0 / 62), "vec-only doc scores its one term")
    assert(m(12L) == r(1.0 / 63))
    // ordering: consensus, then the better single-list ranks
    assert(out.map(_._1).toSeq == Seq(11L, 10L, 13L, 12L))
  }

  test("N-ranker fusion: the 2-ranker call is row-identical to the general form; a third list reorders by consensus; names must be distinct") {
    val lex = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rk")
    val vec = Seq((11L, 1L), (13L, 2L)).toDF("id", "rk")
    val two = Hybrid.rrfTopK(lex, vec, k = 10)
      .select("id", "rrf", "rk").as[(Long, Double, Long)].collect().toSet
    val twoN = Hybrid.rrfTopKN(Seq("lex" -> lex, "vec" -> vec), k = 10)
      .select("id", "rrf", "rk").as[(Long, Double, Long)].collect().toSet
    assert(two == twoN, "rrfTopK must be exactly rrfTopKN at arity 2")
    // a third ranker that loves doc 12 lifts it over the single-listers
    val third = Seq((12L, 1L), (10L, 5L)).toDF("id", "rk")
    val three = Hybrid.rrfTopKN(
        Seq("lex" -> lex, "vec" -> vec, "x" -> third), k = 10)
      .select("id", "rrf", "rk").as[(Long, Double, Long)]
      .collect().sortBy(_._3)
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    val m3 = three.map(o => o._1 -> o._2).toMap
    assert(m3(12L) == r(1.0 / 63 + 1.0 / 61),
      "terms sum across all three rankers")
    assert(m3(13L) == r(1.0 / 62), "absent lists still contribute zero")
    assert(three.map(_._1).indexOf(12L) < three.map(_._1).indexOf(13L),
      "two-list consensus must outrank the single-lister it trailed at arity 2")
    intercept[IllegalArgumentException] {
      Hybrid.rrfTopKN(Seq("a" -> lex, "a" -> vec), k = 10)
    }
  }

  test("hybrid over the real corpus: k well-formed rows, both modalities represented at fusion depth") {
    val emb = Tables.embeddings(spark, sf001)
    val corpus = Tables.documents(spark, sf001)
      .join(emb.select($"vec_id".as("doc_id"), $"embedding"), Seq("doc_id"))
      .filter($"doc_id" >= 5)
    val qv = emb.filter($"vec_id" === 3).select($"embedding".as("qvec"))
    val out = Hybrid.hybridTopK(corpus, "doc_id", "text", "embedding",
      Seq("spark", "window", "merge"), qv, k = 10, m = 20)
    val rows = out.select("id", "rrf", "rk").as[(Long, Double, Long)]
      .collect().sortBy(_._3)
    assert(rows.length == 10)
    assert(rows.map(_._3).toSeq == (1L to 10L))
    assert(rows.map(_._1).distinct.length == 10)
    // monotone fused scores
    assert(rows.sliding(2).forall(p => p.head._2 >= p.last._2))
    // the fused list draws on both rankers: at least one top doc comes
    // from each modality's top-20
    val lexTop = TextIndex.bm25TopK(corpus, "doc_id", "text",
        Seq("spark", "window", "merge"), 20)
      .select("id").as[Long].collect().toSet
    assert(rows.exists(r => lexTop.contains(r._1)),
      "fusion must surface lexical hits")
    assert(rows.exists(r => !lexTop.contains(r._1)),
      "fusion must surface vector-only hits on this corpus")
  }

  test("indexed serving: exhaustive-probe fusion ≡ inline fusion row for row; pruned probe clears a fused recall floor") {
    val emb = Tables.embeddings(spark, sf001)
    val corpus = Tables.documents(spark, sf001)
      .join(emb.select($"vec_id".as("doc_id"), $"embedding"), Seq("doc_id"))
      .filter($"doc_id" >= 5)
    val qv = emb.filter($"vec_id" === 3).select($"embedding".as("qvec"))
    val terms = Seq("spark", "window", "merge")
    val bm25Path = graft.Staging.dirFor("hybrid-spec-bm25")
    TextIndex.writePostings(corpus, "doc_id", "text", bm25Path)
    val vecCorpus = corpus.select($"doc_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(vecCorpus, "id", "vec", k = 8)
    val annPath = graft.Staging.dirFor("hybrid-spec-ann")
    IvfIndex.writeIndexed(vecCorpus, cents, annPath)
    val inline = Hybrid.hybridTopK(corpus, "doc_id", "text", "embedding",
        terms, qv, k = 10, m = 20)
      .select("id", "rrf", "rk").as[(Long, Double, Long)]
      .collect().sortBy(_._3).toSeq
    val indexed = Hybrid.hybridTopKIndexed(spark, bm25Path, annPath,
        cents, terms, qv, k = 10, m = 20, nProbe = 8)
      .select("id", "rrf", "rk").as[(Long, Double, Long)]
      .collect().sortBy(_._3).toSeq
    assert(indexed == inline,
      "exhaustive-probe indexed fusion must replay the inline fusion exactly")
    val pruned = Hybrid.hybridTopKIndexed(spark, bm25Path, annPath,
        cents, terms, qv, k = 10, m = 20, nProbe = 2)
      .select("id").as[Long].collect().toSet
    val recall = inline.map(_._1).count(pruned.contains) / 10.0
    info(f"fused recall@10 at nProbe=2 of 8 cells: $recall%.2f")
    assert(recall >= 0.5,
      s"the lexical half is probe-independent, so fused recall must stay high: $recall")
  }

  test("fusion depth m must cover k") {
    val df = Seq((1L, 1L)).toDF("id", "rk")
    intercept[IllegalArgumentException] {
      Hybrid.hybridTopK(df.withColumn("text", lit("x"))
          .withColumn("vec", array(lit(1.0f))),
        "id", "text", "vec", Seq("x"),
        Seq(Tuple1(Seq(1.0f))).toDF("qvec"), k = 10, m = 5)
    }
  }
}
