package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunked-grid resampling ([[Resample]]): the grid identity (chunked
  * ≡ single-sequence), forward-fill semantics, and the adversarial
  * key the chunking exists for — one user spanning 30 YEARS, which a
  * single `sequence(h0, h1)` would materialize as one ~263k-element
  * array per row (and a worse key would OOM outright). The
  * cross-engine replay is the `q_resample_ffill` oracle. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def evDF(rows: (Long, Long, Long, Double)*) =
    rows.toDF("user_id", "event_id", "t_sec", "value")
      .withColumn("hour", col("t_sec") - pmod(col("t_sec"), lit(3600L)))

  test("chunked grid equals the single-sequence grid") {
    val hourly = Seq((1L, 3600L * 10, 1.0), (1L, 3600L * 2500, 2.0),
        (2L, 3600L * 7, 3.0))
      .toDF("user_id", "hour", "obs")
    val got = Resample.hourGrid(hourly).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = hourly.groupBy($"user_id")
      .agg(min($"hour").as("h0"), max($"hour").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1", lit(3600L))).as("hour"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.size == 2492 && want.size == 2492) // spans 10..2500 and {7}
  }

  test("forward fill carries the last observation; observed hours flagged") {
    val ev = evDF((1L, 1L, 3600L * 1 + 5, 10.0), (1L, 2L, 3600L * 1 + 9, 11.0),
      (1L, 3L, 3600L * 4, 12.0))
    val got = Resample.hourlyFfill(ev).orderBy("hour")
      .select($"hour" / 3600, $"filled", $"is_observed")
      .as[(Double, Double, Boolean)].collect().toSeq
    // hour 1: latest of the two in-hour events (t_sec 9 > 5) → 11.0
    assert(got == Seq((1.0, 11.0, true), (2.0, 11.0, false),
      (3.0, 11.0, false), (4.0, 12.0, true)))
  }

  test("adversarial 30-year single-user span resamples without an unbounded array") {
    val thirtyYears = 30L * 365 * 24 * 3600
    val ev = evDF((7L, 1L, 0L, 1.5), (7L, 2L, thirtyYears, 2.5))
    val res = Resample.hourlyFfill(ev).cache()
    try {
      val n = res.count()
      assert(n == thirtyYears / 3600 + 1, s"grid rows $n")
      assert(res.filter($"is_observed").count() == 2)
      // every unobserved hour carries the first observation forward
      assert(res.filter(!$"is_observed" && $"filled" =!= 1.5).count() == 0)
      // the chunk decomposition really bounds the outer explode: the
      // spanned chunk count is span/ChunkHours, minuscule vs the grid
      val chunks = thirtyYears / 3600 / Resample.ChunkHours + 1
      assert(chunks < 300, s"outer explode width $chunks")
    } finally res.unpersist()
  }
}
