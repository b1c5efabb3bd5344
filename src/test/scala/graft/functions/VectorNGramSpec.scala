package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The codegen'd fast paths must be *exactly* equivalent to the
  * declarative formulations they replace: ngram_hashes vs
  * xxhash64(string shingles), dot/cosine vs zip_with+aggregate.
  */
class VectorNGramSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  leading whitespace run",
    "trailing whitespace run  ",
    "multi   space\tand\ttabs\nand newlines",
    "two words",      // < n tokens → whole-text shingle
    "one",
    "",               // empty doc
    "dup dup dup dup dup", // repeated grams → distinct collapses
    "unicode café naïve 你好 tokens here",
    (1 to 200).map(i => s"w${i % 37}").mkString(" "))

  private lazy val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("ngram_hashes equals xxhash64 of the string-shingle path") {
    for (n <- Seq(2, 3, 5)) {
      val fromStrings = Dedup.shingles(df, "doc_id", "text", n)
        .select(col("id"), xxhash64(col("shingle")).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fromExpr = Dedup.shingleHashes(df, "doc_id", "text", n)
        .select(col("id"), col("shingle"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fromExpr == fromStrings, s"n=$n hash sets diverge")
    }
  }

  test("minhash signatures from hash shingles equal the string path") {
    val a = Dedup.minhashSignaturesFromShingles(
        Dedup.shingles(df, "doc_id", "text"), numHashes = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val b = Dedup.minhashSignaturesFromHashes(
        Dedup.shingleHashes(df, "doc_id", "text"), numHashes = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(a == b)
  }

  test("dot_product and cosine_sim match the interpreted HOF math") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1), Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val vdf = vecs.toDF("id", "a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val rows = vdf.select(col("id"),
        functions.dot_product(col("a"), col("b")).as("fast"),
        hofDot.as("slow"),
        functions.cosine_sim(col("a"), col("b")).as("fastcos"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9, s"dot id=${r.getLong(0)}")
      val (a, b) = (vecs(r.getLong(0).toInt)._2, vecs(r.getLong(0).toInt)._3)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val cos = dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
      assert(math.abs(r.getDouble(3) - cos) < 1e-9, s"cos id=${r.getLong(0)}")
    }
  }

  test("dot_product mixed float/double element types and null semantics") {
    val d = Seq((1L, Array(1.0f, 2.0f), Array(0.5, 0.25)))
      .toDF("id", "a", "b")
    assert(d.select(functions.dot_product(col("a"), col("b"))).head.getDouble(0) == 1.0)
    // length mismatch → null (zip_with-pad parity)
    val m = Seq((1L, Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("id", "a", "b")
      .select(functions.cosine_sim(col("a"), col("b")).as("c"), functions.dot_product(col("a"), col("b")).as("d"))
      .head
    assert(m.isNullAt(0) && m.isNullAt(1))
  }

  test("cosine_sim of a zero-norm vector is null, never NaN") {
    // NaN sorts above every real double: a zero embedding would silently
    // win every top-k and pass every >= threshold filter.
    val d = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 0.0f)),
      (3L, Array(3.0f, 0.0f), Array(7.0f, 0.0f))).toDF("id", "a", "b")
    val rows = d.select(col("id"), functions.cosine_sim(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1))
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-9)
    // and a null score never outranks a real one
    val top = d.select(col("id"), functions.cosine_sim(col("a"), col("b")).as("c"))
      .orderBy(desc("c")).head
    assert(top.getLong(0) == 3L)
  }

  test("mis-typed inputs fail at analysis time, not execution time") {
    val d = Seq((1L, Array(1, 2))).toDF("id", "a")
    intercept[org.apache.spark.sql.AnalysisException] {
      d.select(functions.dot_product(col("a"), col("a"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      d.select(functions.ngram_hashes(col("id"), 3)).collect()
    }
  }

  test("expressions survive both codegen and interpreted eval") {
    // force interpreted path via filter on a non-deterministic-ish plan:
    // collect() through a local relation exercises eval(); the parquet
    // scans elsewhere exercise doGenCode. Cross-check one value here.
    val h = NGramHash.ngramHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c d"), 3)
    assert(h.numElements() == 2)
    val viaSpark = df.filter(col("doc_id") === 0)
      .select(graft.functions.functions.ngram_hashes(col("text"), 3).as("h"))
      .head.getSeq[Long](0).toSet
    val direct = NGramHash.ngramHashes(
      org.apache.spark.unsafe.types.UTF8String.fromString(texts.head), 3)
    assert(viaSpark == direct.toLongArray().toSet)
  }
}
