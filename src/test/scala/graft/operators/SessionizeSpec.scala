package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap break starts a new session; equal timestamps stay together") {
    val ev = Seq(
      (1L, 100L), (1L, 200L), (1L, 200L), (1L, 5000L), (1L, 5100L),
      (2L, 50L))
      .toDF("user_id", "t_sec")
    val got = Sessionize.byGap(ev, "user_id", "t_sec", gapSeconds = 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 100L, 0L), (1L, 200L, 0L), (1L, 200L, 0L),
      (1L, 5000L, 1L), (1L, 5100L, 1L),
      (2L, 50L, 0L)))
  }

  test("session stats: bounds, duration, counts") {
    val ev = Seq((7L, 10L), (7L, 20L), (7L, 10000L)).toDF("user_id", "t_sec")
    val got = Sessionize.sessionStats(ev, "user_id", "t_sec", 1800)
      .orderBy($"session_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("session_start") == 10L)
    assert(got(0).getAs[Long]("session_end") == 20L)
    assert(got(0).getAs[Long]("duration_sec") == 10L)
    assert(got(0).getAs[Long]("n_events") == 2L)
    assert(got(1).getAs[Long]("n_events") == 1L)
  }
}
