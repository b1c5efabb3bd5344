package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bottom-k quantile sketch ([[Sketches.kmvSketch]]): rank-adaptive
  * where the fixed-bin histogram demonstrably is not, exactly
  * mergeable, prefilter-exact, exact below k, and its streaming twin
  * tracks batch bit-identically. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Heavy-tailed corpus: 99% of rows uniform-ish in [0, 1), 1% spread
    * over [1e6, 1e9) — the doc-length/score shape at 100 TB. */
  private def heavyTail: Seq[(Long, String, Double)] =
    (1L to 20000L).map { i =>
      val v = if (i % 100 == 0) 1e6 + (i % 997) * 1e6 else (i % 1000) / 1000.0
      (i, "g", v)
    }

  private def rankError(data: Seq[Double], est: Double, q: Double): Double = {
    val n = data.size.toDouble
    math.abs(data.count(_ <= est) / n - q)
  }

  test("heavy tail: the fixed-bin histogram FAILS the rank bracket the KMV sample passes") {
    val df = heavyTail.toDF("id", "g", "v")
    val values = heavyTail.map(_._3)
    // fixed-bin, self-ranged, 128 bins — the family's previous best
    val (hs, lo, width) = Sketches.histogramSketchAuto(df, Seq("g"), col("v"))
    val hist = Sketches.histogramQuantiles(hs, Seq("g"), lo, width,
      Seq("p50" -> 0.5)).collect().head.getAs[Double]("p50")
    val histErr = rankError(values, hist, 0.5)
    assert(histErr > 0.2,
      s"the histogram is EXPECTED to fail here (err $histErr) — " +
        "if it passes, the demonstration corpus no longer demonstrates")
    // KMV k=1024: uniform rank error ~1.36/√k ≈ 4.3% at 95% — bracket 6%
    val sk = Sketches.kmvSketch(df, Seq("g"), col("id"), col("v"), "kt", 1024)
    val got = Sketches.kmvQuantiles(sk, Seq("g"), 1024,
      Seq("p50" -> 0.5, "p99" -> 0.99)).collect().head
    assert(rankError(values, got.getAs[Double]("p50"), 0.5) <= 0.06,
      s"p50 rank error: ${rankError(values, got.getAs[Double]("p50"), 0.5)}")
    assert(rankError(values, got.getAs[Double]("p99"), 0.99) <= 0.06,
      s"p99 rank error: ${rankError(values, got.getAs[Double]("p99"), 0.99)}")
  }

  test("merge ≡ whole: union of split sketches re-ranks to the whole-corpus sketch") {
    val df = heavyTail.toDF("id", "g", "v")
    val whole = Sketches.kmvSketch(df, Seq("g"), col("id"), col("v"), "kt", 256)
    val s1 = Sketches.kmvSketch(df.filter($"id" % 2 === 0), Seq("g"),
      col("id"), col("v"), "kt", 256)
    val s2 = Sketches.kmvSketch(df.filter($"id" % 2 =!= 0), Seq("g"),
      col("id"), col("v"), "kt", 256)
    val qs = Seq("p50" -> 0.5, "p95" -> 0.95)
    val a = Sketches.kmvQuantiles(whole, Seq("g"), 256, qs).collect().toSeq
    val b = Sketches.kmvQuantiles(s1.union(s2), Seq("g"), 256, qs).collect().toSeq
    assert(a == b, s"whole $a vs merged $b")
  }

  test("prefilter is exact while ≥ k rows survive, and cuts at the scan") {
    val df = heavyTail.toDF("id", "g", "v")
    val plain = Sketches.kmvSketch(df, Seq("g"), col("id"), col("v"), "kt", 128)
    // rate 0.1 over 20k rows → ~2000 expected survivors ≫ k=128
    val pre = Sketches.kmvSketch(df, Seq("g"), col("id"), col("v"), "kt", 128,
      prefilterRate = Some(0.1))
    assert(plain.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1), r.getDouble(2))) ==
      pre.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1), r.getDouble(2))))
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), s"threshold must cut pre-exchange:\n$plan")
  }

  test("aggregate form ≡ window form, and it partial-aggregates before the exchange") {
    val df = heavyTail.toDF("id", "g", "v")
    val win = Sketches.kmvSketch(df, Seq("g"), col("id"), col("v"), "kt", 128)
    val agg = Sketches.kmvSketchAgg(df, Seq("g"), col("id"), col("v"), "kt", 128)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(win) == rows(agg), "the two formulations must emit the same sketch")
    // plan: object-hash aggregate with a partial pass below the exchange —
    // the map-side cut that bounds the shuffle at partitions × groups × k
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object agg:\n$plan")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial aggregation must sit BELOW the exchange (plan prints top-down):\n$plan")
    // quantiles downstream agree too
    val qs = Seq("p50" -> 0.5, "p99" -> 0.99)
    assert(Sketches.kmvQuantiles(win, Seq("g"), 128, qs).collect().toSeq ==
      Sketches.kmvQuantiles(agg, Seq("g"), 128, qs).collect().toSeq)
  }

  test("null-bearing input: both forms drop null id/value rows and agree") {
    // a null id (null hash) has no rank position; a null value carries
    // no sample information — both forms must filter them identically,
    // not rank-nulls-first (window) vs throw (typed aggregator)
    val df = Seq(
      (java.lang.Long.valueOf(1L), "g", java.lang.Double.valueOf(1.0)),
      (null.asInstanceOf[java.lang.Long], "g", java.lang.Double.valueOf(2.0)),
      (java.lang.Long.valueOf(3L), "g", null.asInstanceOf[java.lang.Double]),
      (java.lang.Long.valueOf(4L), "g", java.lang.Double.valueOf(4.0)),
      (java.lang.Long.valueOf(5L), "g", java.lang.Double.valueOf(5.0))
    ).toDF("id", "g", "v")
    val win = Sketches.kmvSketch(df, Seq("g"), col("id"), col("v"), "kt", 16)
    val agg = Sketches.kmvSketchAgg(df, Seq("g"), col("id"), col("v"), "kt", 16)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = rows(win)
    assert(got == rows(agg), "forms must agree on null-bearing inputs")
    assert(got.map(_._3) == Set(1.0, 4.0, 5.0),
      s"exactly the non-null (id, v) rows survive, got $got")
  }

  test("a group smaller than k is its own sample: quantiles exact") {
    val tiny = (1L to 9L).map(i => (i, "t", i.toDouble)).toDF("id", "g", "v")
    val sk = Sketches.kmvSketch(tiny, Seq("g"), col("id"), col("v"), "kt", 256)
    val got = Sketches.kmvQuantiles(sk, Seq("g"), 256,
      Seq("p50" -> 0.5, "p100" -> 1.0)).collect().head
    assert(got.getAs[Double]("p50") == 5.0 && got.getAs[Double]("p100") == 9.0)
    assert(got.getAs[Long]("m_sample") == 9L)
  }

  test("inactivity TTL evicts idle groups; a re-warm restarts as an honest fresh sample; order-freedom survives") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.KmvStream
    val mem = MemoryStream[(Long, String, Double)]
    val est = KmvStream.quantiles(mem.toDF().toDF("id", "g", "v"),
      "g", "id", "v", seed = "kt", k = 8, qs = Seq(0.5),
      inactivityTtl = Some("1 millisecond"))
    // A ProcessingTimeTimeout query runs timer-sweep batches even with
    // no data, so processAllAvailable() can starve — drive the
    // assertions by POLLING the sink with a deadline instead, and
    // throttle the batch loop with a periodic trigger.
    val q = est.writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .format("memory").queryName("kmv_ttl").start()
    def latest(g: String): Option[(Int, Seq[Double])] =
      spark.table("kmv_ttl").collect().zipWithIndex
        .filter(_._1.getString(0) == g)
        .sortBy(_._2).lastOption
        .map { case (r, _) => (r.getInt(1), r.getSeq[Double](2)) }
    def await(what: String)(pred: => Boolean): Unit = {
      val end = System.currentTimeMillis + 30000
      while (!pred && System.currentTimeMillis < end) Thread.sleep(100)
      assert(pred, s"timed out awaiting: $what")
    }
    try {
      // batch 1: 20 rows for group a, deliberately SHUFFLED — arrival
      // order must not affect the sketch
      val a1 = (1L to 20L).map(i => (i, "a", (i * 37 % 100).toDouble))
      val batchA1 = Sketches.kmvQuantiles(
        Sketches.kmvSketch(a1.toDF("id", "g", "v"), Seq("g"),
          col("id"), col("v"), "kt", 8), Seq("g"), 8, Seq("p50" -> 0.5))
        .collect().head.getAs[Double]("p50")
      mem.addData(new scala.util.Random(5).shuffle(a1): _*)
      await("group a saturated at k=8")(latest("a").exists(_._1 == 8))
      assert(latest("a").get._2 == Seq(batchA1),
        "order-free: shuffled arrival ≡ batch")

      // group a now idles past the 1 ms TTL; the next timer-sweep batch
      // evicts it. A group-b arrival doubles as the liveness witness.
      Thread.sleep(300)
      mem.addData((100L, "b", 1.0), (101L, "b", 2.0))
      await("group b emitted")(latest("b").isDefined)
      Thread.sleep(300) // let the sweep after b's batch run too

      // re-warm: a re-appears with 5 NEW ids. If the old sketch had
      // survived, the merged sample would still be saturated (m = 8);
      // an honest restart reports m = 5 — a sample of data since
      // re-warm, nothing pretending to cover the evicted population.
      val a2 = (31L to 35L).map(i => (i, "a", i.toDouble))
      val batchA2 = Sketches.kmvQuantiles(
        Sketches.kmvSketch(a2.toDF("id", "g", "v"), Seq("g"),
          col("id"), col("v"), "kt", 8), Seq("g"), 8, Seq("p50" -> 0.5))
        .collect().head.getAs[Double]("p50")
      mem.addData(a2: _*)
      await("group a re-warmed fresh (m=5)")(latest("a").exists(_._1 == 5))
      assert(latest("a").get._2 == Seq(batchA2),
        "re-warmed sketch ≡ batch sketch over post-eviction data alone")
    } finally q.stop()
  }

  test("default policy: eviction is ON (7-day TTL armed) unless explicitly opted out, and the default still matches batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.KmvStream
    def timeoutOf(ttl: Option[String] = null): String = {
      val mem = MemoryStream[(Long, String, Double)]
      val est =
        if (ttl == null) // no argument passed — the DEFAULT policy
          KmvStream.quantiles(mem.toDF().toDF("id", "g", "v"),
            "g", "id", "v", seed = "kt", k = 8, qs = Seq(0.5))
        else KmvStream.quantiles(mem.toDF().toDF("id", "g", "v"),
          "g", "id", "v", seed = "kt", k = 8, qs = Seq(0.5),
          inactivityTtl = ttl)
      est.queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.FlatMapGroupsWithState =>
          f.timeout.toString
      }.head
    }
    // state is bounded by default: the no-arg form arms the
    // processing-time sweep; None is the explicit opt-out
    assert(timeoutOf() == "ProcessingTimeTimeout",
      "default must arm group eviction")
    assert(timeoutOf(None) == "NoTimeout",
      "None must remain the explicit opt-out")
    // and the default-policy query still runs ≡ batch (the 7-day
    // horizon never fires inside a test — this pins liveness +
    // parity under ProcessingTimeTimeout, the mode all default
    // callers now run in)
    val mem = MemoryStream[(Long, String, Double)]
    val est = KmvStream.quantiles(mem.toDF().toDF("id", "g", "v"),
      "g", "id", "v", seed = "kt", k = 8, qs = Seq(0.5))
    val q = est.writeStream.outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .format("memory").queryName("kmv_default").start()
    try {
      val rows = (1L to 20L).map(i => (i, "a", (i * 37 % 100).toDouble))
      val batch = Sketches.kmvQuantiles(
        Sketches.kmvSketch(rows.toDF("id", "g", "v"), Seq("g"),
          col("id"), col("v"), "kt", 8), Seq("g"), 8, Seq("p50" -> 0.5))
        .collect().head.getAs[Double]("p50")
      mem.addData(rows: _*)
      val end = System.currentTimeMillis + 30000
      def latest(): Option[Seq[Double]] =
        spark.table("kmv_default").collect().zipWithIndex
          .sortBy(_._2).lastOption.map(_._1.getSeq[Double](2))
      while (latest().isEmpty && System.currentTimeMillis < end) Thread.sleep(100)
      assert(latest().contains(Seq(batch)),
        "default-policy stream must equal the batch sketch")
    } finally q.stop()
  }

  test("streaming twin ≡ batch over data-so-far, every prefix") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.KmvStream
    val data = (1L to 600L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", ((i * 37) % 500).toDouble))
    val mem = MemoryStream[(Long, String, Double)]
    val qs = Seq(0.5, 0.9)
    // TTL explicitly OFF: processAllAvailable() STARVES under
    // ProcessingTimeTimeout (the engine schedules no-data timer-sweep
    // batches back to back, so "all available processed" never
    // settles) — and this test's per-prefix parity needs its
    // deterministic batch boundaries. The default policy has its own
    // case above, driven by polling.
    val est = KmvStream.quantiles(mem.toDF().toDF("id", "g", "v"),
      "g", "id", "v", seed = "kt", k = 64, qs = qs, inactivityTtl = None)
    val q = est.writeStream.outputMode("update")
      .format("memory").queryName("kmv_stream").start()
    try {
      data.grouped(250).zipWithIndex.foreach { case (chunk, ci) =>
        mem.addData(chunk: _*); q.processAllAvailable()
        val soFar = data.take((ci + 1) * 250).toDF("id", "g", "v")
        val sk = Sketches.kmvSketch(soFar, Seq("g"), col("id"), col("v"), "kt", 64)
        val batch = Sketches.kmvQuantiles(sk, Seq("g"), 64,
            qs.map(x => s"q$x" -> x)).collect()
          .map(r => r.getString(0) -> (r.getLong(r.length - 1),
            qs.indices.map(i => r.getDouble(i + 1)))).toMap
        // latest emission per group = the stream's current answer
        val streamed = spark.table("kmv_stream").collect()
          .map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2)))
        val latest = streamed.zipWithIndex.groupBy(_._1._1)
          .map { case (g, rows) => g -> rows.maxBy(_._2)._1 }
        latest.foreach { case (g, (_, m, ests)) =>
          val (bm, bests) = batch(g)
          assert(m.toLong == bm && ests == bests,
            s"prefix ${ci + 1}, group $g: stream ($m, $ests) vs batch ($bm, $bests)")
        }
      }
    } finally q.stop()
  }
}
