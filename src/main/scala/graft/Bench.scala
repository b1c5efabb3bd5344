package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Timing forces full materialization through the noop DSv2 sink (every
  * row produced, nothing collected to the driver) — `count()` alone
  * would let Catalyst prune aggregates and under-report scan cost.
  */
object Bench {

  /** Headline set: the scan/agg/join/window core plus one representative
    * of each extension family. The full catalog runs in Verify; bench
    * excludes the quadratic exact-Jaccard oracle (its scalable twin,
    * minhash_lsh, is included).
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_top_orders", "q5_region_revenue", "q_window_top_orders",
    "q_events_hourly", "d2_rules_join", "d12_cdc_last_state",
    "sync_pipeline_filtered", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "ann_topk", "text_stats", "multimodal_meta")

  /** Per-query wall-time budgets (seconds) at sf0.1, set ~2× the quiet-
    * host min-of-3 so only real regressions (or sustained stalls) trip. */
  val budgetsSf01: Map[String, Double] = Map(
    "dedup_minhash_lsh" -> 20.0,
    "dedup_simhash" -> 10.0,
    "ann_topk" -> 4.0,
    "text_stats" -> 5.0,
    "dedup_exact" -> 3.0,
    "multimodal_meta" -> 3.0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      // The catalog's wide-aggregate queries (64 minhash min-aggs, 60
      // simhash bit-sums) each generate huge codegen classes; the default
      // 100-entry compiled-class cache evicts them between interleaved
      // rounds, so every sample re-pays Janino + JIT (~12 s for the LSH
      // DAG — measured 17.9 s interleaved vs 2.2 s solo). A catalog this
      // wide needs a cache sized to the working set. Static conf: must be
      // set before the first session of the JVM.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm the JVM/codegen once on the smallest SF so measured times are
    // compute, not first-call classloading.
    SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Three timed rounds, INTERLEAVED (round 1 of every query before
    // round 2 of any), min per query: the shared VM shows intermittent
    // multi-minute stalls (high host sys-time), and back-to-back samples
    // of one query can both land inside a single stall window —
    // interleaving spreads a query's samples minutes apart so one stall
    // can contaminate at most one of them.
    // Optional comma-separated subset for focused local iteration, e.g.
    // SPARK_GRAFT_BENCH_QUERIES=dedup_minhash_lsh,dedup_simhash.
    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // A subset naming no valid query must fail loudly, not print a
    // clean-looking zero-total result.
    subset.foreach { s =>
      val unknown = s -- headline.toSet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] WARNING: unknown subset queries: ${unknown.toSeq.sorted.mkString(",")}")
      if (s.intersect(headline.toSet).isEmpty) {
        System.err.println(s"[bench] FATAL: subset matches no headline query")
        spark.stop()
        sys.exit(2)
      }
    }
    val present = headline
      .filter(SparkEntry.queries.contains)
      .filter(n => subset.forall(_.contains(n)))
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    val rounds = (1 to 3).map(_ => present.map(n => n -> timeOnce(n)).toMap)
    val results = present.map(n => n -> rounds.map(_(n)).min)
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Per-query wall-time budgets at sf0.1 — perf regressions should fail
    // loudly like correctness does, not drift silently between rounds.
    val violations =
      if (sfDir.endsWith("sf0.1"))
        results.filter { case (n, t) => budgetsSf01.get(n).exists(t > _) }
      else Seq.empty
    violations.foreach { case (n, t) =>
      System.err.println(f"[bench] BUDGET VIOLATION: $n took $t%.1f s (budget ${budgetsSf01(n)}%.1f s)")
    }
    val vjson = violations.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    // Record when a subset was active so a partial run's lower total can
    // never be mistaken for a full-gate result in round artifacts.
    val subsetJson = subset
      .map(s => s""","subset":${s.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")}""")
      .getOrElse("")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"budget_violations":$vjson$subsetJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
