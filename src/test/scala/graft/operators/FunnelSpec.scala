package graft.operators

import graft.SparkSpec

/** Generic k-step funnel ([[Funnel.firstCompletion]]): first-completion
  * semantics, per-transition windows, repeated step types, and the
  * min-tie rule. The cross-engine gates are the `q_funnel` /
  * `q_funnel_steps` oracles, which now run through this operator. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "t_sec")

  private def run(df: org.apache.spark.sql.DataFrame, steps: Seq[String],
      windows: Seq[Long]): Map[Long, Seq[Long]] =
    Funnel.firstCompletion(df, steps, windows).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong).toSeq).toMap

  test("three steps with per-transition windows; min at every step") {
    val df = ev(
      // user 1: completes a→b→c; second b inside window must not win
      (1L, "a", 100L), (1L, "b", 150L), (1L, "b", 120L), (1L, "c", 130L),
      // user 2: b before a only → no completion
      (2L, "b", 50L), (2L, "a", 60L),
      // user 3: a→b ok, c outside the second window
      (3L, "a", 0L), (3L, "b", 10L), (3L, "c", 100L))
    val got = run(df, Seq("a", "b", "c"), Seq(50L, 30L))
    // user 1: t0=100, first b in (100,150] is 120, first c in (120,150] is 130
    assert(got == Map(1L -> Seq(100L, 120L, 130L)))
  }

  test("repeated step type needs a strictly later event") {
    val df = ev(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "a", 30L), // a→b→a completes
      (2L, "a", 10L), (2L, "b", 20L))                 // no second a
    val got = run(df, Seq("a", "b", "a"), Seq(100L, 100L))
    assert(got == Map(1L -> Seq(10L, 20L, 30L)))
  }

  test("first-step ties resolve to the minimum; window is exclusive-start") {
    val df = ev(
      (1L, "x", 5L), (1L, "x", 3L), (1L, "y", 3L), (1L, "y", 8L))
    // t0 = 3; y at t=3 is NOT after t0 (strict >), so t1 = 8
    assert(run(df, Seq("x", "y"), Seq(10L)) == Map(1L -> Seq(3L, 8L)))
  }

  test("invalid configurations are rejected") {
    val df = ev((1L, "a", 1L))
    intercept[IllegalArgumentException](Funnel.firstCompletion(df, Seq("a"), Nil))
    intercept[IllegalArgumentException](
      Funnel.firstCompletion(df, Seq("a", "b"), Seq(1L, 2L)))
    intercept[IllegalArgumentException](
      Funnel.firstCompletion(df, Seq("a", "b"), Seq(0L)))
  }
}
