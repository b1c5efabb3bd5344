package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming anomaly flags ([[AnomalyStream]]): bit-identical to the
  * batch q_anomaly formulation on in-order arrival (incl. the
  * same-timestamp peer rule), frame eviction at the 24h horizon. */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  /** The batch q_anomaly shape over the same rows. */
  private def batchFlags(rows: Seq[(Long, Long, Timestamp, Double)]) = {
    val w = Window.partitionBy($"user_id").orderBy($"t_sec")
      .rangeBetween(-86399, 0)
    rows.toDF("user_id", "event_id", "ts", "value")
      .select($"user_id", $"event_id", $"ts".cast("long").as("t_sec"),
        round($"value" * 100, 0).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum($"cents").over(w))
      .withColumn("q", sum($"cents" * $"cents").over(w))
      .filter($"n" >= 8)
      .withColumn("dev", $"cents" * $"n" - $"s")
      .withColumn("is_anomaly", $"dev" * $"dev" > lit(4L) * ($"n" * $"q" - $"s" * $"s"))
      .select($"user_id", $"event_id", $"t_sec", $"cents", $"n", $"s", $"q", $"is_anomaly")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
  }

  test("batch and stream agree, including a same-timestamp peer group") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1: 9 steady values then one spike; two events share t=800
    val steady = (1 to 7).map(i => (1L, i.toLong, ts(i * 100L), 10.0 + i * 0.01))
    val peers = Seq((1L, 8L, ts(800), 10.08), (1L, 9L, ts(800), 10.09))
    val spike = Seq((1L, 10L, ts(900), 95.0))
    val data = steady ++ peers ++ spike
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val fl = AnomalyStream.flags(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
    val q = fl.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("anom_out").start()
    try {
      // in-order, same-t peers inside one batch (the documented contract)
      mem.addData(steady: _*); q.processAllAvailable()
      mem.addData(peers: _*); q.processAllAvailable()
      mem.addData(spike: _*); q.processAllAvailable()
      val streamed = spark.table("anom_out")
        .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batchFlags(data),
        s"stream $streamed\nbatch ${batchFlags(data)}")
      assert(streamed.exists(r => r._2 == 10L && r._8), "the spike must flag")
      assert(streamed.count(_._8) == 1, "only the spike flags")
    } finally q.stop()
  }

  test("frame evicts at the 24h horizon exactly like the batch RANGE frame") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 12 old events; a 13th one day later — its frame must hold only
    // events within [t-86399, t] (the first 4 fall out)
    val old = (1 to 12).map(i => (2L, i.toLong, ts(i * 10L), 20.0))
    val late = Seq((2L, 13L, ts(86400L + 45), 20.0))
    val data = old ++ late
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val fl = AnomalyStream.flags(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
    val q = fl.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("anom_evict").start()
    try {
      mem.addData(old: _*); q.processAllAvailable()
      mem.addData(late: _*); q.processAllAvailable()
      val streamed = spark.table("anom_evict")
        .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batchFlags(data), s"got $streamed")
      // late frame: events at t >= 86445-86399 = 46 → ids 5..12 + itself
      val lateRow = streamed.find(_._2 == 13L).get
      assert(lateRow._5 == 9L, s"late frame must hold 9 events: $lateRow")
    } finally q.stop()
  }

  test("transformWithState twin: v1 and v2 agree on the full script, incl. same-t peers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steady = (1 to 7).map(i => (1L, i.toLong, ts(i * 100L), 10.0 + i * 0.01))
    val peers = Seq((1L, 8L, ts(800), 10.08), (1L, 9L, ts(800), 10.09))
    val spike = Seq((1L, 10L, ts(900), 95.0))
    val other = (1 to 9).map(i => (2L, (20 + i).toLong, ts(i * 50L), 7.0))
    val chunks = Seq(steady ++ other.take(4), peers ++ other.drop(4), spike)

    def run(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[AnomalyStream.Flagged],
        name: String) = {
      val mem = MemoryStream[(Long, Long, Timestamp, Double)]
      val q = mk(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(name).start()
      try {
        chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
        spark.table(name)
          .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
      } finally q.stop()
    }

    val v1 = run(AnomalyStream.flags(_), "anom_v1")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val v2 = run(AnomalyStream.flagsTws(_), "anom_v2")
      assert(v1 == v2, s"v1 $v1\nv2 $v2")
      assert(v1 == batchFlags(chunks.flatten), "both must equal batch")
      assert(v1.exists(r => r._2 == 10L && r._8), "the spike must flag in both")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("idle-user state drops after the horizon; re-appearance re-warms without a false flag") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400L
    // user 7 warms a full frame early, then goes idle
    val warm = (1 to 10).map(i => (7L, i.toLong, ts(i * 10L), 30.0))
    // user 8 runs far in the future, advancing the watermark (delay 1h)
    // well past user 7's last event + 24h
    val mover = (1 to 3).map(i => (8L, (100 + i).toLong, ts(3 * day + i * 10L), 5.0))
    val mover2 = Seq((8L, 104L, ts(3 * day + 40L), 5.0))
    // user 7 re-appears after the horizon: a spike among too few events
    // to reach MinFrame — must NOT flag (frame restarted empty)
    val back = Seq((7L, 20L, ts(3 * day + 100L), 30.0),
      (7L, 21L, ts(3 * day + 110L), 500.0))
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val fl = AnomalyStream.flags(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
    val q = fl.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("anom_ttl").start()
    try {
      mem.addData(warm: _*); q.processAllAvailable()
      mem.addData(mover: _*); q.processAllAvailable()
      // one more batch so the timeout sweep runs with the advanced watermark
      mem.addData(mover2: _*); q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1L,
        s"idle user 7's state must be reclaimed (only user 8 remains), got $stateRows")
      mem.addData(back: _*); q.processAllAvailable()
      val streamed = spark.table("anom_ttl")
        .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
      assert(!streamed.exists(r => r._2 >= 20L),
        s"re-warmed frame below MinFrame must score nothing: $streamed")
      // batch remains the truth: the batch RANGE frame over ALL events
      // computes the same rows (user 7's comeback frame has n=2 < 8 there too)
      assert(streamed == batchFlags(warm ++ mover ++ mover2 ++ back))
    } finally q.stop()
  }

  test("TTL arms from the NEWEST buffered event: an out-of-order straggler cannot cause a premature state drop") {
    // Regression for the round-12 advice item: the timer used to arm
    // from buf.last — but an admissible straggler is APPENDED to the
    // frame, so buf.last could be OLDER than the newest entry and the
    // timeout fired before newest+24h, dropping state an admissible
    // event could still see. Script (1h watermark delay):
    //   b1  user 7: 8 events at 100000..100007
    //   b2  user 7: straggler at 97007 (admissible; buf.last becomes it
    //       → buggy timer 97007+24h=183407; correct 100007+24h=186407)
    //   b3  user 8 at 187600 → watermark advances to 184000 after b3
    //   b4  user 8 at 187601 → timeout sweep at watermark 184000:
    //       buggy code drops user 7 here (183407 < 184000 < 186407)
    //   b5  user 7 probe at 186000 (admissible): its trailing frame
    //       reaches the buffered 100000..100007 events → with state
    //       intact the frame has ≥ 8 entries and a row is EMITTED;
    //       with the premature drop the frame restarts at 1 → silence.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = (0 to 7).map(i => (7L, i.toLong, ts(100000L + i), 10.0 + i * 0.01))
    val b2 = Seq((7L, 20L, ts(97007L), 10.0))
    val b3 = Seq((8L, 30L, ts(187600L), 10.0))
    val b4 = Seq((8L, 31L, ts(187601L), 10.0))
    val b5 = Seq((7L, 40L, ts(186000L), 10.0))
    def run(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[AnomalyStream.Flagged], name: String) = {
      val mem = MemoryStream[(Long, Long, Timestamp, Double)]
      val q = mk(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(name).start()
      try {
        Seq(b1, b2, b3, b4, b5).foreach { b =>
          mem.addData(b: _*); q.processAllAvailable()
        }
        spark.table(name).as[AnomalyStream.Flagged].collect().toSeq
      } finally q.stop()
    }
    def check(rows: Seq[AnomalyStream.Flagged], name: String): Unit = {
      val probe = rows.find(_.event_id == 40L)
      assert(probe.isDefined,
        s"$name: the probe event must still see the buffered frame " +
          "(state survived the straggler-window sweep)")
      assert(probe.get.n >= 9, s"$name: frame must hold the buffered events: $probe")
    }
    check(run(AnomalyStream.flags(_), "anom_straggler_v1"), "v1")
    // the v2 processor had the same buf.last arming — run it on RocksDB
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try check(run(AnomalyStream.flagsTws(_), "anom_straggler_v2"), "v2")
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
