package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks latest right row at or before left time, per key") {
    val left = Seq(
      (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"),
      (2L, 7L, "e4"), (3L, 9L, "e5"))
      .toDF("k", "t", "ev")
    val right = Seq(
      (1L, 5L, "r@5"), (1L, 15L, "r@15"),
      (2L, 8L, "r@8")) // after e4 → no match for key 2
      .toDF("k", "t", "payload")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("payload"))
      .select("ev", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "e1" -> Some("r@5"),   // equal time matches (≤ semantics)
      "e2" -> Some("r@5"),
      "e3" -> Some("r@15"),
      "e4" -> None,          // right row is later
      "e5" -> None))         // key has no right rows
  }

  test("as-of against windowed-truth oracle on the events/orders tables") {
    val ev = Tables(spark).events
      .select($"event_id", $"user_id", graft.Tables.tsSeconds($"ts").as("t_sec"))
    val ord = Tables(spark).orders
      .selectExpr("o_custkey AS user_id",
        "unix_timestamp(o_orderdate) AS ot", "o_orderkey")
    // oracle: plain inequality join + max_by (fine at test scale)
    val truth = ev.join(ord, ev("user_id") === ord("user_id") && $"ot" <= $"t_sec", "left")
      .groupBy($"event_id")
      .agg(org.apache.spark.sql.functions.max_by($"o_orderkey", $"ot").as("want"))
    // dedup orders per (user,t) like the production query does
    val got = AsOfJoin.asOf(ev,
      ord.withColumnRenamed("ot", "t_sec"),
      Seq("user_id"), "t_sec", "t_sec", Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey".as("got"))
    val joined = truth.join(got, "event_id")
    val mismatches = joined.filter(!($"want" <=> $"got")).count()
    // ties on (user, ot) can legitimately differ between max_by and
    // carry-forward; require exact match elsewhere
    val ties = ord.groupBy($"user_id", $"ot").count().filter($"count" > 1).count()
    assert(mismatches <= ties, s"$mismatches mismatches vs $ties ties")
  }

  private case class Tables(s: org.apache.spark.sql.SparkSession) {
    def events = graft.Tables.events(s, sf001)
    def orders = graft.Tables.orders(s, sf001)
  }
}
