package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: exact on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
      .toDF("a", "b")
    val got = df.select(round(Similarity.cosine($"a", $"b"), 6)).as[Double].collect()
    assert(got.toSeq == Seq(1.0, 0.0))
  }

  test("brute-force top-k: k rows per query, self excluded, rank ordered") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 3).select($"vec_id".as("id"), $"embedding".as("vec"))
    val got = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
    assert(got.length == 15)
    val byQ = got.groupBy(_.getAs[Long]("qid"))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores.sliding(2).forall(w => w.size < 2 || w(0) >= w(1)))
    }
  }

  test("LSH top-k achieves high recall@10 vs brute force") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 10).select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // The synthetic embeddings have weak top-10 neighbors (cos ≈ 0.3-0.5),
    // so the bucket granularity must be coarse: p(bit agrees) ≈ 0.63 at
    // cos 0.4 → 4 bits/table ≈ 16% per table, 16 tables ≈ 94% recall.
    val approx = Similarity.lshTopK(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 16)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall@10 = $recall")
  }

  test("multi-probe: nProbes=1 is row-identical to single-probe LSH") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 10).select($"vec_id".as("id"), $"embedding".as("vec"))
    val single = Similarity.lshTopK(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 8)
      .select("qid", "id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val multi = Similarity.lshTopKMultiProbe(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 8, nProbes = 1)
      .select("qid", "id", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(single == multi)
  }

  test("multi-probe buys back the recall of twice the tables at half the index") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 10).select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val half = recall(Similarity.lshTopK(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 8))
    val full = recall(Similarity.lshTopK(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 16))
    val multi = recall(Similarity.lshTopKMultiProbe(queries, corpus, k = 10,
      dim = 64, bitsPerTable = 4, tables = 8, nProbes = 3))
    info(f"recall@10: 8 tables=$half%.3f, 16 tables=$full%.3f, 8 tables x 3 probes=$multi%.3f")
    assert(multi > half,
      f"extra probes must lift recall: $multi%.3f vs $half%.3f")
    assert(multi >= full - 0.05,
      f"3-probe at 8 tables should match 16 tables: $multi%.3f vs $full%.3f")
  }

  test("bucket-partitioned LSH corpus: probe is partition pruning, results identical") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5).select($"vec_id".as("id"), $"embedding".as("vec"))
    val path = java.nio.file.Files.createTempDirectory("lshidx").toFile.getAbsolutePath
    Similarity.writeLshBucketed(corpus, dim = 64, bitsPerTable = 4, tables = 16, path)
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("bucket=")) > 1,
      "corpus must be laid out by bucket")
    val indexed = Similarity.lshTopKIndexed(spark, path, queries, k = 10,
      dim = 64, bitsPerTable = 4, tables = 16)
    val inline = Similarity.lshTopK(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 16)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(indexed) == key(inline), "indexed probe ≡ inline probe")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"probe must prune bucket partitions:\n$plan")
  }

  test("indexed multi-probe ≡ inline multi-probe; on-disk postings unchanged; still partition-pruned") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.filter($"vec_id" >= 5).select($"vec_id".as("id"), $"embedding".as("vec"))
    val path = java.nio.file.Files.createTempDirectory("lshmpidx").toFile.getAbsolutePath
    // the SAME single-posting-per-table layout single-probe uses —
    // multi-probe is a query-side decision, never an ingest one
    Similarity.writeLshBucketed(corpus, dim = 64, bitsPerTable = 4, tables = 8, path)
    val indexed = Similarity.lshTopKIndexed(spark, path, queries, k = 10,
      dim = 64, bitsPerTable = 4, tables = 8, nProbes = 3)
    val inline = Similarity.lshTopKMultiProbe(queries, corpus, k = 10,
      dim = 64, bitsPerTable = 4, tables = 8, nProbes = 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(indexed) == key(inline),
      "indexed multi-probe must equal the inline multi-probe")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"multi-probe must still prune bucket partitions:\n$plan")
  }

  test("embedding components: planted vector clusters collapse, others stay apart") {
    val rnd = new scala.util.Random(7)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val dim = 16
    // 5 clusters × 3 near-identical variants (cos ≈ 0.999) + 6 unrelated
    val centers = (0 until 5).map(_ => unit(dim))
    val docs = (for {
      c <- 0 until 5; v <- 0 until 3
    } yield {
      val eps = 0.02f * v
      val vec = centers(c).zipWithIndex.map { case (x, i) =>
        x + (if (i == v) eps else 0f)
      }
      ((c * 10 + v).toLong, vec)
    }) ++ (0 until 6).map(u => ((100 + u).toLong, unit(dim)))
    val df = docs.toDF("vec_id", "embedding")
    val comps = Similarity.embeddingComponents(df, "vec_id", "embedding",
        dim = dim, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(comps.size == 21)
    (0 until 5).foreach { c =>
      val members = (0 until 3).map(v => comps((c * 10 + v).toLong)).toSet
      assert(members == Set((c * 10).toLong), s"cluster $c collapses: $members")
    }
    (0 until 6).foreach(u => assert(comps((100 + u).toLong) == 100L + u,
      "unrelated vectors stay singletons"))
  }

  test("cosineDupPairs respects blocking and threshold") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.1f), 0),   // near-dup of 1, same block
      (3L, Seq(1.0f, 0.0f), 1),    // identical to 1 but different block
      (4L, Seq(0.0f, 1.0f), 0))    // orthogonal, same block
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cosineDupPairs(df, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
