package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("event_id", "p_sec").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned band join ≡ naive inequality join on real events") {
    val ev = Tables.events(spark, sf001)
      .select($"event_id", $"event_type", Tables.tsSeconds($"ts").as("t_sec"))
    val left = ev.filter($"event_type" === "error").select($"event_id", $"t_sec")
    val right = ev.filter($"event_type" =!= "error").select($"t_sec".as("p_sec"))
    val binned = RangeJoin.bandJoin(left, "t_sec", right, "p_sec", -300L, 0L)
    val naive = RangeJoin.bandJoinNaive(left, "t_sec", right, "p_sec", -300L, 0L)
    assert(pairsOf(binned) == pairsOf(naive), "binned rewrite must not change pairs")
    assert(pairsOf(binned).nonEmpty, "band must match something on this corpus")
  }

  test("band boundaries are [low, high): inclusive low, exclusive high") {
    val left = Seq((1L, 1000L)).toDF("event_id", "t_sec")
    val right = Seq(700L, 699L, 1000L, 999L).toDF("p_sec")
    val got = RangeJoin.bandJoin(left, "t_sec", right, "p_sec", -300L, 0L)
      .select($"p_sec").as[Long].collect().toSet
    assert(got == Set(700L, 999L), s"expected {700, 999}, got $got")
  }

  test("windows spanning a bin edge and negative times still match") {
    // bin width = 500; left window [t-500, t) crosses a bin boundary
    val left = Seq((1L, 250L), (2L, -100L)).toDF("event_id", "t_sec")
    val right = Seq(-400L, -350L, -101L, -100L, 0L, 100L, 249L, 250L).toDF("p_sec")
    val got = RangeJoin.bandJoin(left, "t_sec", right, "p_sec", -500L, 0L)
    val byId = got.collect().groupBy(_.getAs[Long]("event_id"))
      .view.mapValues(_.map(_.getAs[Long]("p_sec")).toSet).toMap
    assert(byId(1L) == Set(-101L, -100L, 0L, 100L, 249L))
    assert(byId(2L) == Set(-400L, -350L, -101L))
  }

  test("salted band join ≡ plain band join, including on a planted hot bin") {
    val ev = Tables.events(spark, sf001)
      .select($"event_id", $"event_type", Tables.tsSeconds($"ts").as("t_sec"))
    val left = ev.filter($"event_type" === "error").select($"event_id", $"t_sec")
    // plant a hot bin: all probes collapsed onto one second, plus the real ones
    val burst = spark.range(500).select((lit(86_400L)).as("p_sec"))
    val right = ev.filter($"event_type" =!= "error").select($"t_sec".as("p_sec"))
      .union(burst)
    val plain = RangeJoin.bandJoin(left, "t_sec", right, "p_sec", -300L, 0L)
      .groupBy($"event_id").count()
    val salted = RangeJoin.bandJoinSalted(left, "t_sec", right, "p_sec",
        -300L, 0L, saltBy = "p_sec", salt = 8)
      .groupBy($"event_id").count()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(salted) == m(plain), "salting must not change the join result")
  }

  test("overlap join ≡ naive on session-shaped intervals; each pair exactly once") {
    // user sessions (from real events, 30-min gap) overlap-joined
    // against incident windows (error event ± 2 min)
    val ev = Tables.events(spark, sf001)
      .select($"user_id", $"event_id", $"event_type", Tables.tsSeconds($"ts").as("t_sec"))
    val sessions = graft.operators.Sessionize.sessionStats(
        ev.select($"user_id", $"event_id", $"t_sec"), "user_id", "t_sec", 1800)
      .select($"user_id", $"session_id", $"session_start".as("s_start"),
        ($"session_end" + 1).as("s_end"))
    val incidents = ev.filter($"event_type" === "error")
      .select($"event_id".as("incident_id"),
        ($"t_sec" - 120).as("i_start"), ($"t_sec" + 120).as("i_end"))
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_id", "incident_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val binned = keys(RangeJoin.overlapJoin(sessions, "s_start", "s_end",
      incidents, "i_start", "i_end", binWidth = 600))
    val naive = keys(RangeJoin.overlapJoinNaive(sessions, "s_start", "s_end",
      incidents, "i_start", "i_end"))
    assert(binned.toSet == naive.toSet, "overlap rewrite must not change pairs")
    assert(binned.length == binned.toSet.size,
      "each overlapping pair must be emitted exactly once (no bin duplicates)")
    assert(binned.nonEmpty, "sessions must overlap incidents on this corpus")
  }

  test("overlap join: intervals longer than the bin width still match correctly") {
    val l = Seq((1L, 0L, 2500L), (2L, 3000L, 3001L)).toDF("lid", "ls", "le")
    val r = Seq((10L, 2400L, 2600L), (11L, 900L, 901L), (12L, 2600L, 3200L),
      (13L, 5000L, 5001L)).toDF("rid", "rs", "re")
    val got = RangeJoin.overlapJoin(l, "ls", "le", r, "rs", "re", binWidth = 100)
      .select($"lid", $"rid").collect().map(rw => (rw.getLong(0), rw.getLong(1)))
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (2L, 12L)), s"got ${got.toSet}")
    assert(got.length == got.toSet.size, "exactly-once emission across many shared bins")
  }

  test("plan is an equi-join on bins — never a nested loop") {
    val ev = Tables.events(spark, sf001)
      .select($"event_id", $"event_type", Tables.tsSeconds($"ts").as("t_sec"))
    val left = ev.filter($"event_type" === "error").select($"event_id", $"t_sec")
    val right = ev.filter($"event_type" =!= "error").select($"t_sec".as("p_sec"))
    val plan = RangeJoin.bandJoin(left, "t_sec", right, "p_sec", -300L, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band join must not plan a nested loop:\n$plan")
    // the naive formulation IS the nested loop — the rewrite is what
    // removes it, so pin the contrast
    val naivePlan = RangeJoin.bandJoinNaive(left, "t_sec", right, "p_sec", -300L, 0L)
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"),
      s"naive baseline unexpectedly planned without a nested loop:\n$naivePlan")
  }
}
