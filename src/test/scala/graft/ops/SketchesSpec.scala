package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Portable HLL ([[Sketches]]): accuracy on both correction branches,
  * the split-merge identity that makes the sketch distributable, and
  * partitioning invariance. The cross-engine replay (hash → registers
  * → estimate → branch pick) is the `q_hll_distinct` oracle. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def approxOf(df: DataFrame): Double =
    df.select("approx").as[Double].head()

  test("raw-HLL branch: ~1500 distinct at p=6 (m=64) lands within 3σ") {
    // distinct l_orderkey at sf0.001 ≫ 2.5·64 — the raw branch, with
    // theoretical rse 1.04/√64 = 13%.
    val li = Tables.lineitem(spark, sf001).withColumn("g", lit("all"))
    val exact = li.select("l_orderkey").distinct().count().toDouble
    assert(exact > 2.5 * 64, s"fixture must exercise the raw branch ($exact)")
    val est = approxOf(Sketches.hllDistinct(li, Seq("g"), col("l_orderkey"), "s1", p = 6))
    assert(math.abs(est - exact) / exact < 0.39,
      s"exact=$exact approx=$est (3x the 13% rse)")
  }

  test("linear-counting branch: 200 distinct at p=9 is near-exact") {
    val df = (1 to 1000).map(i => ("all", i % 200)).toDF("g", "v")
    val est = approxOf(Sketches.hllDistinct(df, Seq("g"), col("v"), "s2", p = 9))
    assert(math.abs(est - 200.0) / 200.0 < 0.1,
      s"linear counting at occupancy ~200/512 should be tight, got $est")
  }

  test("split sketches merge to the whole-corpus sketch exactly") {
    val li = Tables.lineitem(spark, sf001).withColumn("g", lit("all"))
    val whole = approxOf(Sketches.hllDistinct(li, Seq("g"), col("l_orderkey"), "s3", p = 9))
    // two disjoint splits sketched INDEPENDENTLY, merged register-wise
    val a = Sketches.hllRegisters(li.filter(col("l_orderkey") % 2 === 0),
      Seq("g"), col("l_orderkey"), "s3", p = 9)
    val b = Sketches.hllRegisters(li.filter(col("l_orderkey") % 2 =!= 0),
      Seq("g"), col("l_orderkey"), "s3", p = 9)
    val merged = approxOf(Sketches.hllEstimate(a.union(b), Seq("g"), p = 9))
    assert(merged == whole,
      s"register max-merge must equal the single-pass sketch: $merged vs $whole")
    // and merging a sketch with itself changes nothing (idempotent max)
    val doubled = approxOf(Sketches.hllEstimate(a.union(b).union(a), Seq("g"), p = 9))
    assert(doubled == whole, "duplicate registers must not move the estimate")
  }

  test("estimate is partitioning-invariant") {
    val li = Tables.lineitem(spark, sf001).withColumn("g", lit("all"))
    val one = approxOf(Sketches.hllDistinct(li.coalesce(1), Seq("g"),
      col("l_orderkey"), "s4", p = 9))
    val many = approxOf(Sketches.hllDistinct(li.repartition(7), Seq("g"),
      col("l_orderkey"), "s4", p = 9))
    assert(one == many, s"max-based sketch cannot depend on arrival order: $one vs $many")
  }

  private def tokenStream = Tables.documents(spark, sf001)
    .filter(col("text").isNotNull)
    .select(explode(org.apache.spark.sql.functions.filter(
      split(col("text"), "\\s+"), t => t =!= "")).as("token"))

  test("CMS never underestimates; wide sketch is collision-free exact") {
    val toks = tokenStream
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
    // tiny sketch: collisions guaranteed (31 tokens into 16 buckets)
    val tiny = Sketches.cmsLookup(
        Sketches.cmsSketch(toks, col("token"), "t1", d = 4, w = 16),
        exact, col("token"), "t1", d = 4, w = 16)
      .join(exact, col("v") === col("token"))
      .select("v", "est", "n").as[(String, Long, Long)].collect()
    assert(tiny.nonEmpty && tiny.forall { case (_, est, n) => est >= n },
      s"CMS must only over-count: ${tiny.filter(t => t._2 < t._3).toSeq}")
    assert(tiny.exists { case (_, est, n) => est > n },
      "w=16 over a 31-token vocab must actually collide somewhere")
    // wide sketch: every token exact
    val wide = Sketches.cmsLookup(
        Sketches.cmsSketch(toks, col("token"), "t1", d = 4, w = 4096),
        exact, col("token"), "t1", d = 4, w = 4096)
      .join(exact, col("v") === col("token"))
      .select("est", "n").as[(Long, Long)].collect()
    assert(wide.forall { case (est, n) => est == n },
      "4096 buckets for 31 tokens: min over 4 rows must hit a clean cell")
  }

  test("CMS weighted build from pre-aggregated counts equals the raw-occurrence build") {
    val toks = tokenStream
    val raw = Sketches.cmsSketch(toks, col("token"), "t2", d = 4, w = 16)
    val agg = toks.groupBy("token").agg(count(lit(1)).as("n"))
    val weighted = Sketches.cmsSketch(agg, col("token"), "t2", d = 4, w = 16,
      weight = col("n"))
    assert(raw.as[(Int, Long, Long)].collect().toSet ==
      weighted.as[(Int, Long, Long)].collect().toSet,
      "sketching (value, count) with weights must be cell-identical to raw occurrences")
  }

  test("CMS sketches of disjoint splits merge by cell-wise addition") {
    val toks = tokenStream.withColumn("half", xxhash64(col("token")) % 2 === 0)
    val whole = Sketches.cmsSketch(toks, col("token"), "t3", d = 4, w = 16)
    val a = Sketches.cmsSketch(toks.filter(col("half")), col("token"), "t3", d = 4, w = 16)
    val b = Sketches.cmsSketch(toks.filter(!col("half")), col("token"), "t3", d = 4, w = 16)
    val merged = a.union(b).groupBy("i", "bucket").agg(sum("c").as("c"))
    assert(merged.as[(Int, Long, Long)].collect().toSet ==
      whole.as[(Int, Long, Long)].collect().toSet,
      "cell-wise sum of split sketches must equal the whole-corpus sketch")
  }

  test("plan: CMS lookup broadcasts the sketch — candidates never shuffle for the join") {
    val toks = tokenStream
    val sketch = Sketches.cmsSketch(toks, col("token"), "t4", d = 4, w = 16)
    val cands = toks.groupBy("token").agg(count(lit(1)).as("n"))
    val q = Sketches.cmsLookup(sketch, cands, col("token"), "t4", d = 4, w = 16)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the d·w-cell sketch must broadcast (it is corpus-size-independent):\n$p")
  }

  test("plan: two aggregation exchanges total — registers then group rollup") {
    val li = Tables.lineitem(spark, sf001).withColumn("g", col("l_returnflag"))
    val q = Sketches.hllDistinct(li, Seq("g"), col("l_orderkey"), "s5", p = 9)
    q.collect()
    // Count executed shuffle stages (the AQE plan STRING prints the
    // initial plan's exchanges a second time — ShuffleQueryStage rows
    // exist only in the final plan).
    val p = q.queryExecution.executedPlan.toString
    assert(p.split("ShuffleQueryStage").length - 1 == 2,
      s"register agg + group rollup; the estimate's merge re-agg must reuse the\n" +
        s"(group, j) partitioning, not add a third shuffle:\n$p")
  }

  // ----------------------------------------------------------------
  // Fixed-bin quantile sketch
  // ----------------------------------------------------------------

  private def ordersByStatus = Tables.orders(spark, sf001)

  test("histogram quantile lands in the bin containing the exact quantile") {
    // est = lower edge of the first bin whose cumulative count reaches
    // ⌈q·n⌉ ⇒ the value AT rank ⌈q·n⌉ (the definition the sketch
    // discretizes) lies in [est, est + width). Every group, both qs.
    import org.apache.spark.sql.expressions.Window
    val width = 5000.0
    val sk = Sketches.histogramSketch(ordersByStatus, Seq("o_orderstatus"),
      col("o_totalprice"), lo = 0.0, width = width)
    val est = Sketches.histogramQuantiles(sk, Seq("o_orderstatus"), 0.0, width,
        Seq("p50_est" -> 0.5, "p95_est" -> 0.95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val wr = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
    val wn = Window.partitionBy(col("o_orderstatus"))
    val ranked = ordersByStatus
      .withColumn("r", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
    val exact = Seq(0.5 -> "p50", 0.95 -> "p95").map { case (q, nm) =>
      nm -> ranked.filter(col("r") === ceil(lit(q) * col("n")))
        .select(col("o_orderstatus"), col("o_totalprice"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }.toMap
    est.foreach { case (g, (e50, e95)) =>
      val v50 = exact("p50")(g)
      val v95 = exact("p95")(g)
      assert(v50 >= e50 && v50 < e50 + width,
        s"$g p50: rank-target value $v50 outside bin [$e50, ${e50 + width})")
      assert(v95 >= e95 && v95 < e95 + width,
        s"$g p95: rank-target value $v95 outside bin [$e95, ${e95 + width})")
    }
  }

  test("histogram rank error is bounded by the chosen bin's mass") {
    val width = 5000.0
    val sk = Sketches.histogramSketch(ordersByStatus, Seq("o_orderstatus"),
      col("o_totalprice"), lo = 0.0, width = width).cache()
    val est = Sketches.histogramQuantiles(sk, Seq("o_orderstatus"), 0.0, width,
        Seq("p50_est" -> 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    est.foreach { case (g, e50, n) =>
      val target = math.ceil(0.5 * n).toLong
      // true rank of the estimate (count of values < est) and of the
      // bin's far edge bracket the target rank
      val below = ordersByStatus.filter(col("o_orderstatus") === g &&
        col("o_totalprice") < e50).count()
      val upto = ordersByStatus.filter(col("o_orderstatus") === g &&
        col("o_totalprice") < e50 + width).count()
      assert(below < target && target <= upto,
        s"$g: target rank $target outside the chosen bin [$below, $upto]")
    }
    sk.unpersist()
  }

  test("histogram sketches of disjoint splits merge to the whole by bin-wise addition") {
    val whole = Sketches.histogramSketch(ordersByStatus, Seq("o_orderstatus"),
      col("o_totalprice"), 0.0, 5000.0)
    val a = Sketches.histogramSketch(
      ordersByStatus.filter(col("o_orderkey") % 2 === 0), Seq("o_orderstatus"),
      col("o_totalprice"), 0.0, 5000.0)
    val b = Sketches.histogramSketch(
      ordersByStatus.filter(col("o_orderkey") % 2 =!= 0), Seq("o_orderstatus"),
      col("o_totalprice"), 0.0, 5000.0)
    val merged = a.union(b).groupBy("o_orderstatus", "bin").agg(sum("cnt").as("cnt"))
    assert(merged.as[(String, Long, Long)].collect().toSet ==
      whole.as[(String, Long, Long)].collect().toSet,
      "bin-wise sum of split sketches must equal the whole-corpus sketch")
    // and the quantile step over the merged relation equals the whole —
    // the estimate consumes the sketch, never the data
    val qa = Sketches.histogramQuantiles(a.union(b), Seq("o_orderstatus"),
      0.0, 5000.0, Seq("p50_est" -> 0.5)).collect().toSet
    val qw = Sketches.histogramQuantiles(whole, Seq("o_orderstatus"),
      0.0, 5000.0, Seq("p50_est" -> 0.5)).collect().toSet
    assert(qa == qw, "quantiles from merged splits must equal whole-corpus quantiles")
  }

  test("histogram sketch: streaming micro-batch sketches merge to the batch sketch") {
    // The sketch relation is the state a streaming aggregation carries:
    // per-micro-batch sketches accumulate by the SAME bin-wise re-sum
    // that merges splits, so a foreachBatch accumulator is exactly the
    // batch sketch — quantiles included.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.orders(spark, sf001)
      .select($"o_orderstatus", $"o_totalprice")
      .as[(String, Double)].collect().toSeq
    val mem = MemoryStream[(String, Double)]
    val acc = graft.Staging.dirFor("hist-stream-acc")
    val q = mem.toDF.toDF("o_orderstatus", "o_totalprice").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Sketches.histogramSketch(b, Seq("o_orderstatus"),
            col("o_totalprice"), 0.0, 5000.0)
          .write.mode("overwrite").parquet(s"$acc/batch=$id")
        ()
      }
      .option("checkpointLocation", graft.Staging.dirFor("hist-stream-ckp"))
      .start()
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(acc)
      .groupBy("o_orderstatus", "bin").agg(sum("cnt").as("cnt"))
    val whole = Sketches.histogramSketch(ordersByStatus, Seq("o_orderstatus"),
      col("o_totalprice"), 0.0, 5000.0)
    assert(streamed.as[(String, Long, Long)].collect().toSet ==
      whole.as[(String, Long, Long)].collect().toSet,
      "accumulated micro-batch sketches must equal the batch sketch")
    val qs = Sketches.histogramQuantiles(streamed, Seq("o_orderstatus"),
      0.0, 5000.0, Seq("p50_est" -> 0.5)).collect().toSet
    val qb = Sketches.histogramQuantiles(whole, Seq("o_orderstatus"),
      0.0, 5000.0, Seq("p50_est" -> 0.5)).collect().toSet
    assert(qs == qb, "quantiles from the streamed sketch must equal batch quantiles")
  }

  test("histogram sketch size is bounded by the value range, not the corpus") {
    val sk = Sketches.histogramSketch(ordersByStatus, Seq("o_orderstatus"),
      col("o_totalprice"), 0.0, 5000.0)
    val rows = sk.count()
    val maxBins = ordersByStatus.select(
      (ceil(max(col("o_totalprice")) / 5000.0) + 1).cast("long")).head().getLong(0)
    val groups = ordersByStatus.select("o_orderstatus").distinct().count()
    assert(rows <= maxBins * groups,
      s"sketch rows $rows exceed groups×bins bound ${maxBins * groups}")
  }

  test("self-ranging sketch equals the explicit-range sketch at its own edges") {
    val (skAuto, lo, width) = Sketches.histogramSketchAuto(ordersByStatus,
      Seq("o_orderstatus"), col("o_totalprice"), bins = 64)
    val skExplicit = Sketches.histogramSketch(ordersByStatus,
      Seq("o_orderstatus"), col("o_totalprice"), lo, width)
    assert(skAuto.collect().toSet == skExplicit.collect().toSet)
    // the derived range must actually cover the data: bins in [0, 64]
    // (the max value itself lands exactly on the closing edge → bin 64)
    val bins = skAuto.select("bin").as[Long].collect()
    assert(bins.min == 0 && bins.max <= 64,
      s"derived range must cover the data: bins ${bins.min}..${bins.max}")
    // and its quantile estimates bracket the exact quantile within width
    val est = Sketches.histogramQuantiles(skAuto, Seq("o_orderstatus"),
        lo, width, Seq("p50_est" -> 0.5))
      .select("o_orderstatus", "p50_est").as[(String, Double)].collect().toMap
    val exact = ordersByStatus
      .groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p"))
      .as[(String, Double)].collect().toMap
    exact.foreach { case (g, p) =>
      assert(est(g) <= p + 1e-9 && p - est(g) <= width + 1e-9,
        s"group $g: p50 est ${est(g)} not within one bin below exact $p")
    }
  }

  test("self-ranging pre-pass shape is footer-answerable (PushedAggregation)") {
    // the pre-pass inside histogramSketchAuto is agg(min(col), max(col))
    // with NO cast wrapping the column — assert that exact shape pushes
    // to parquet footers when aggregate pushdown is on, and that the
    // derived range equals the data-page answer
    val conf = spark.conf
    val prevV1 = conf.get("spark.sql.sources.useV1SourceList",
      "avro,csv,json,kafka,orc,parquet,text")
    val prevAgg = conf.get("spark.sql.parquet.aggregatePushdown", "false")
    try {
      conf.set("spark.sql.sources.useV1SourceList", "")
      conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val raw = spark.read.parquet(s"$sf001/lineitem.parquet")
      val pre = raw.agg(min(col("l_extendedprice")), max(col("l_extendedprice")))
      assert(pre.queryExecution.executedPlan.toString.contains("PushedAggregation"),
        "the self-ranging pre-pass shape must answer from footers")
      val (_, lo, width) = Sketches.histogramSketchAuto(raw, Seq("l_returnflag"),
        col("l_extendedprice"), bins = 64)
      val r = pre.collect()(0)
      assert(lo == r.getDouble(0))
      assert(width == (r.getDouble(1) - r.getDouble(0)) / 64)
    } finally {
      conf.set("spark.sql.sources.useV1SourceList", prevV1)
      conf.set("spark.sql.parquet.aggregatePushdown", prevAgg)
    }
  }

  test("self-ranging sketch on a constant column answers the constant") {
    val df = Seq.fill(100)(("g", 42.5)).toDF("g", "v")
    val (sk, lo, width) = Sketches.histogramSketchAuto(df, Seq("g"), col("v"))
    assert(lo == 42.5 && width == 1.0)
    val q = Sketches.histogramQuantiles(sk, Seq("g"), lo, width,
      Seq("p50_est" -> 0.5, "p99_est" -> 0.99)).collect()(0)
    assert(q.getDouble(1) == 42.5 && q.getDouble(2) == 42.5)
  }
}
