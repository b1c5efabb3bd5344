package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * A 100 TB corpus is never used whole: the mix recipe says "25% of web
  * text, all of the reference corpus, 10% of forum data". Two
  * properties matter at scale and `rand()` has neither:
  *
  *   - **Reproducibility**: membership must be a pure function of the
  *     row key (re-runs, retries, and different partitionings select
  *     the SAME rows — no sampling drift between pipeline stages that
  *     each re-derive the sample).
  *   - **Nesting**: raising a stratum's rate must only ADD rows
  *     (the 10% sample is a subset of the 20% sample), so ablation
  *     runs at different scales stay comparable.
  *
  * Both fall out of hashing the key to a fixed uniform:
  * `u(key) = md5_60(seed ‖ key) / 2⁶⁰ ∈ [0,1)`, keep iff
  * `u < rate(stratum)`. The hash is the codegen'd
  * [[graft.functions.Md5Hash60Expr]] (scan speed, no UDF) and is
  * engine-portable — DuckDB recomputes it from `md5()` hex digits, so
  * the sample is oracle-checkable row-for-row (`q_sample_mix`).
  * Changing `seed` draws an independent sample family.
  */
object Sampling {

  /** Deterministic uniform in [0,1) from a key column (seeded). */
  def hashUniform(key: Column, seed: String): Column =
    Dedup.md5TokenHash60(concat(lit(seed), key.cast("string")))
      .cast("double") / (1L << 60).toDouble

  /** Stratified sample: per-stratum keep rates, `defaultRate` for
    * strata not in the map. Deterministic and nested in the rates. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      seed: String = "graft"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val rateMap = map(rates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.filter(hashUniform(col(keyCol), seed) <
      coalesce(element_at(rateMap, col(strataCol)), lit(defaultRate)))
  }
}
