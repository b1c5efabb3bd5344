package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf001)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("membership is a pure function of (seed, key): re-runs identical, seeds independent") {
    val r = Map("en" -> 0.3)
    val a = ids(Sampling.stratifiedSample(docs, "doc_id", "lang", r, 0.3, "s1"))
    val b = ids(Sampling.stratifiedSample(docs, "doc_id", "lang", r, 0.3, "s1"))
    assert(a == b, "same seed ⇒ same sample")
    val c = ids(Sampling.stratifiedSample(docs, "doc_id", "lang", r, 0.3, "s2"))
    assert(a != c, "different seed ⇒ different sample family")
  }

  test("rates are edge-exact: 0 keeps nothing, 1 keeps everything") {
    val n = docs.count()
    assert(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 1.0).count() == n)
    assert(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.0).count() == 0)
  }

  test("samples nest: raising a rate only adds rows") {
    val small = ids(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.2))
    val large = ids(Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map.empty, defaultRate = 0.6))
    assert(small.subsetOf(large),
      s"20% sample must be a subset of the 60% sample (|small∖large| = ${(small -- large).size})")
    assert(small.size < large.size)
  }

  test("sampling is stateless: identical membership on a stream, across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = docs.select($"doc_id", $"lang").as[(Long, String)].collect().toSeq
    val batchKept = ids(Sampling.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 0.4), 0.2, "st1"))
    val mem = MemoryStream[(Long, String)]
    val sampled = Sampling.stratifiedSample(
      mem.toDS().toDF("doc_id", "lang"), "doc_id", "lang",
      Map("en" -> 0.4), 0.2, "st1")
    val q = sampled.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("sample_stream").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
      val streamKept = spark.table("sample_stream")
        .select("doc_id").as[Long].collect().toSet
      assert(streamKept == batchKept,
        "hash-membership must not depend on execution mode or batch boundaries")
    } finally q.stop()
  }

  test("weightedSample: inclusion tracks weight; deterministic, nested, positive-only") {
    import spark.implicits._
    // 100 heavy rows (weight 100) among 900 light (weight 1): heavy mass
    // is 10000 vs 900, so a k=50 race should be dominated by heavy rows.
    val pool = ((1 to 100).map(i => (i.toLong, 100L)) ++
      (101 to 1000).map(i => (i.toLong, 1L))).toDF("id", "w")
      .withColumn("g", lit("all"))
    val picked = Sampling.weightedSample(pool, "id", "w", k = 50, seed = "t",
        groupCols = Seq("g"))
      .select("id").as[Long].collect().toSet
    val heavy = picked.count(_ <= 100L)
    assert(heavy >= 35, s"weight-100 rows must dominate the sample: $heavy/50 heavy")
    // deterministic across partitionings
    val again = Sampling.weightedSample(pool.repartition(7), "id", "w", k = 50,
      seed = "t", groupCols = Seq("g")).select("id").as[Long].collect().toSet
    assert(again == picked, "sample must be a pure function of (seed, key, weight)")
    // rank nesting: the k=10 sample is a prefix of the k=50 sample
    val k10 = Sampling.weightedSample(pool, "id", "w", k = 10, seed = "t",
      groupCols = Seq("g")).select("id").as[Long].collect().toSet
    assert(k10.subsetOf(picked), "raising k must only add rows")
    // non-positive weights can never win
    val withZero = pool.union(Seq((2000L, 0L), (2001L, -5L)).toDF("id", "w")
      .withColumn("g", lit("all")))
    val z = Sampling.weightedSample(withZero, "id", "w", k = 2000, seed = "t",
      groupCols = Seq("g")).select("id").as[Long].collect().toSet
    assert(!z.contains(2000L) && !z.contains(2001L))
    // GLOBAL case (no groups): identical result to the grouped form on
    // a single group, via TakeOrdered instead of a one-partition window
    val global = Sampling.weightedSample(pool, "id", "w", k = 50, seed = "t")
    assert(global.select("id").as[Long].collect().toSet == picked,
      "global cut must be row-identical to the single-group windowed form")
    global.collect()
    assert(global.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "global weighted k-cut must not be a single-partition window sort")
  }

  test("reservoir sample: reproducible, nested, mergeable, no global-sort exchange") {
    val pool = docs.select($"doc_id", $"source")
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rk").select("doc_id").as[Long].collect().toSeq
    val r50 = ids(Sampling.reservoirSample(pool, "doc_id", 50, "rs"))
    assert(r50.size == 50 && r50.distinct.size == 50)
    // reproducible across partitionings (pure function of seed+key)
    assert(ids(Sampling.reservoirSample(pool.repartition(13), "doc_id", 50, "rs")) == r50)
    // nested: k=20 is the prefix of k=50
    assert(ids(Sampling.reservoirSample(pool, "doc_id", 20, "rs")) == r50.take(20))
    // mergeable: split reservoirs union-and-re-cut to the whole
    val a = Sampling.reservoirSample(pool.filter($"doc_id" % 2 === 0), "doc_id", 50, "rs")
    val b = Sampling.reservoirSample(pool.filter($"doc_id" % 2 =!= 0), "doc_id", 50, "rs")
    val merged = ids(Sampling.reservoirSample(
      a.drop("rk").unionByName(b.drop("rk")).drop("ukey"), "doc_id", 50, "rs"))
    assert(merged == r50, "union of split reservoirs re-cut must equal the whole-corpus reservoir")
    // plan: the global cut is TakeOrdered, never a single-partition sort
    val q = Sampling.reservoirSample(pool, "doc_id", 50, "rs")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global k-cut must be per-partition heads + driver merge:\n$plan")
  }

  test("per-stratum rates steer the mix") {
    val mixed = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.0, "de" -> 1.0), defaultRate = 0.5)
    val byLang = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("en"), "rate 0 stratum fully dropped")
    assert(byLang("de") == totals("de"), "rate 1 stratum fully kept")
    // default-rate strata land near half (binomial tolerance)
    val others = (totals.keySet - "en" - "de").toSeq
    val keptFrac = others.map(l => byLang.getOrElse(l, 0L)).sum.toDouble /
      others.map(totals).sum
    assert(keptFrac > 0.3 && keptFrac < 0.7, s"default-rate fraction $keptFrac")
  }
}
