package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpusAndQueries(sf: String) = {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    (queries, corpus)
  }

  private def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("training is deterministic; codes cover [0, k) and every row") {
    val (_, corpus) = corpusAndQueries(sf001)
    val cb1 = PqIndex.train(corpus, "id", "vec", m = 8, k = 4, iters = 1)
    val cb2 = PqIndex.train(corpus, "id", "vec", m = 8, k = 4, iters = 1)
    assert(cb1.books.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.books.map(_.map(_.toSeq).toSeq).toSeq, "deterministic training")
    val codes = corpus.select(PqIndex.encode($"vec", cb1).as("c"))
      .select(explode($"c").as("code")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 4))
    assert(codes.length == corpus.count() * 8, "m codes per row")
  }

  test("exhaustive shortlist ≡ brute force; pruned shortlist keeps recall") {
    val (queries, corpus) = corpusAndQueries(sf001)
    val exact = key(Similarity.bruteForceTopK(queries, corpus, k = 10))
    val cb = PqIndex.train(corpus, "id", "vec", m = 8, k = 8, iters = 2)
    val full = key(PqIndex.topK(queries, corpus, cb, k = 10, shortlist = Int.MaxValue))
    assert(full == exact, "shortlist >= corpus ⇒ exact brute force")
  }

  test("pruned shortlist keeps recall (sf0.01 — corpus large enough to measure)") {
    // sf0.001's ~115-row corpus is too small for a stable recall number
    // (independently simulated: 16-centroid PQ at shortlist=100 of 495
    // rows reaches recall@10 ≈ 0.82 on this corpus; assert with margin).
    val (queries, corpus) = corpusAndQueries("/root/testdata/sf0.01")
    val exact = key(Similarity.bruteForceTopK(queries, corpus, k = 10))
    val cb = PqIndex.train(corpus, "id", "vec", m = 8, k = 16, iters = 2)
    val pruned = key(PqIndex.topK(queries, corpus, cb, k = 10, shortlist = 100))
    val recall = (exact intersect pruned).size.toDouble / exact.size
    assert(recall >= 0.7, s"PQ recall@10 = $recall")
  }

  test("encoded corpus: ADC pass reads codes, never the embedding column") {
    val (queries, corpus) = corpusAndQueries(sf001)
    val cb = PqIndex.train(corpus, "id", "vec", m = 8, k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("pqidx").toFile.getAbsolutePath
    PqIndex.writeEncoded(corpus, cb, path)
    val got = PqIndex.topKEncoded(spark, path, queries, cb, k = 10, shortlist = 45)
    val inline = PqIndex.topK(queries, corpus, cb, k = 10, shortlist = 45)
    assert(key(got) == key(inline), "encoded probe ≡ inline probe")
    // The scan feeding the ADC/shortlist stage must be pruned to
    // (id, codes): the vector column may only be read by the re-rank
    // join. Two scans of the store are expected — one with codes and
    // no vec, one with vec and no codes; a scan reading BOTH means the
    // payload leaked into the exhaustive pass.
    val plan = got.queryExecution.executedPlan.toString
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(schemas.exists(s => s.contains("codes") && !s.contains("vec")),
      s"no codes-only scan found:\n$plan")
    assert(schemas.forall(s => !(s.contains("codes") && s.contains("vec"))),
      s"a scan reads codes AND vectors — ADC pass not pruned:\n$plan")
  }
}
