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
