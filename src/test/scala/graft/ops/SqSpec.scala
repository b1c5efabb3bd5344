package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SqSpec extends SparkSpec {
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

  test("codes are bytes, cover every row, and constant dims encode to 0") {
    val df = Seq(
      (1L, Array(0.0f, 5.0f, 7.0f)),
      (2L, Array(1.0f, 5.0f, 3.0f)),
      (3L, Array(2.0f, 5.0f, 11.0f))).toDF("id", "vec")
    val b = Sq.train(df, "vec")
    assert(b.lo.toSeq == Seq(0.0, 5.0, 3.0) && b.hi.toSeq == Seq(2.0, 5.0, 11.0))
    val codes = df.select($"id", Sq.encode($"vec", b).as("c"))
      .orderBy("id").as[(Long, Seq[Int])].collect()
    // dim 1 is constant (hi == lo) → code 0 everywhere; extremes map to
    // 0 / 255 (the v == hi edge floors to exactly 255 after the clamp)
    assert(codes.forall(_._2(1) == 0))
    assert(codes.head._2.head == 0 && codes.last._2.head == 255)
    assert(codes.forall(_._2.forall(c => c >= 0 && c <= 255)))
  }

  test("encode/distance null semantics: length mismatch and null element → null") {
    val b = Sq.SqBounds(Array(0.0, 0.0), Array(1.0, 1.0))
    val df = Seq(
      (1L, Seq[Option[Float]](Some(0.5f), Some(0.5f))),
      (2L, Seq[Option[Float]](Some(0.5f))), // wrong length
      (3L, Seq[Option[Float]](Some(0.5f), None)) // null element
    ).toDF("id", "vec")
    val out = df.select($"id", Sq.encode($"vec", b).as("c")).orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1) && out(2).isNullAt(1))
    val dist = spark.sql(
      "SELECT 1").select(Sq.symDist(
        lit(null).cast("array<int>"), array(lit(1), lit(2))).as("d")).collect()
    assert(dist.head.isNullAt(0), "null codes → null distance")
  }

  test("symmetric topK replays exactly against a local reference computation") {
    val (queries, corpus) = corpusAndQueries(sf001)
    val b = Sq.train(corpus, "vec")
    val got = Sq.topKSym(queries, corpus, b, k = 10)
      .orderBy("qid", "rank")
      .select("qid", "id", "d_code", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))

    def codeOf(x: Double, lo: Double, hi: Double): Long =
      if (hi <= lo) 0L
      else math.min(255L, math.max(0L, math.floor((x - lo) * 255.0 / (hi - lo)).toLong))
    val cs = corpus.select($"id", $"vec").as[(Long, Seq[Float])].collect()
    val qs = queries.select($"qid", $"qvec").as[(Long, Seq[Float])].collect()
    val expected = qs.sortBy(_._1).flatMap { case (qid, qv) =>
      val qc = qv.indices.map(i => codeOf(qv(i).toDouble, b.lo(i), b.hi(i)))
      cs.map { case (id, v) =>
        val cc = v.indices.map(i => codeOf(v(i).toDouble, b.lo(i), b.hi(i)))
        val d = qc.indices.map { i => val x = qc(i) - cc(i); x * x }.sum
        (qid, id, d)
      }.sortBy(t => (t._3, t._2)).take(10).zipWithIndex
        .map { case ((q, i, d), r) => (q, i, d, r + 1) }
    }
    assert(got.toSeq == expected.toSeq)
  }

  test("recall: ADC ≥ 0.95 at sf0.01, and asymmetric ≥ symmetric (cosine truth)") {
    // SQ8 keeps per-dimension resolution, so on a 64-dim corpus both
    // estimators should sit near brute force (L2 ≈ cosine ordering on
    // this corpus's roughly equal-norm vectors); ADC has one
    // quantization error per pair, symmetric has two.
    val (queries, corpus) = corpusAndQueries("/root/testdata/sf0.01")
    val exact = key(Similarity.bruteForceTopK(queries, corpus, k = 10))
    val b = Sq.train(corpus, "vec")
    val adc = key(Sq.topKAdc(queries, corpus, b, k = 10))
    val sym = key(Sq.topKSym(queries, corpus, b, k = 10))
    val rAdc = (exact intersect adc).size.toDouble / exact.size
    val rSym = (exact intersect sym).size.toDouble / exact.size
    assert(rAdc >= 0.95, s"ADC recall@10 = $rAdc")
    assert(rAdc >= rSym, s"asymmetric ($rAdc) should not trail symmetric ($rSym)")
  }

  test("plan: query side broadcast; distance kernel inside whole-stage codegen") {
    val (queries, corpus) = corpusAndQueries(sf001)
    val b = Sq.train(corpus, "vec")
    val df = Sq.topKSym(queries, corpus, b, k = 10)
    df.collect() // finalize AQE so codegen spans appear in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      s"query side not broadcast:\n$plan")
    // codegen'd operators print with a `*(n)` span prefix — the distance
    // kernel's Project must sit inside one, not in an interpreted Project
    assert(plan.linesIterator.exists(l => l.contains("int_sq_dist") && l.contains("*(")),
      s"int_sq_dist not inside a whole-stage codegen span:\n$plan")
  }
}
