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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm the JVM/codegen once on the smallest SF so measured times are
    // compute, not first-call classloading.
    SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Two timed runs per query, min taken: the shared VM shows
    // intermittent multi-second stalls (high host sys-time) that would
    // otherwise dominate single-shot numbers.
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
