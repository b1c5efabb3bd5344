package graft.streaming

import graft.SparkSpec
import graft.ops.{IvfIndex, Retrieval, Similarity}
import org.apache.spark.sql.functions._

/** Streaming serving-quality monitor ([[RecallStream]]): stream ≡
  * batch over data-so-far, the exhaustive-probe identity, the planted
  * frozen-quantizer drift case, replay idempotence, and the live
  * foreachBatch wiring. */
class RecallStreamSpec extends SparkSpec {
  import spark.implicits._

  // 2-D geometry keeps cell membership hand-checkable: two unit
  // centroids on the axes, vectors placed by angle
  private val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
  private def v(id: Long, x: Double, y: Double) = (id, Seq(x.toFloat, y.toFloat))

  private def queries1 =
    Seq((0L, Seq(1.0f, 0.1f))).toDF("qid", "qvec") // probes cell 0 first

  test("planted drift: a frozen nProbe=1 quantizer loses a cross-cell arrival; the exhaustive probe never does") {
    val ann = graft.Staging.dirFor("recall-ann")
    val met = graft.Staging.dirFor("recall-met")
    // epoch 0: everything lives in the query's own cell (x > y ⇒
    // cell 0), pointing AWAY from the query (negative y) so a later
    // cross-cell arrival can beat them on cosine — recall 1.0 for now
    val b0 = Seq(v(10L, 0.8, -0.8), v(11L, 0.9, -0.5)).toDF("id", "vec")
    val m0 = RecallStream.monitorBatch(b0, 0L, ann, met, queries1,
        cents, k = 2, nProbe = 1)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(m0.length == 1 && m0.head._3 == 1.0 && m0.head._5 == 1.0,
      s"in-cell epoch must audit clean: ${m0.toSeq}")
    // epoch 1: a TRUE top-2 neighbor of the query arrives at an angle
    // that assigns to cell 1 (0.71 > 0.69) — the frozen single-probe
    // serving path scans cell 0 only and cannot see it
    val b1 = Seq(v(20L, 0.69, 0.71)).toDF("id", "vec")
    val m1 = RecallStream.monitorBatch(b1, 1L, ann, met, queries1,
        cents, k = 2, nProbe = 1)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(m1.head._3 < 1.0,
      s"the monitor must SEE the frozen-quantizer miss: ${m1.toSeq}")
    // the same epoch audited exhaustively is clean — the miss is the
    // probe's, not the store's
    val mAll = RecallStream.monitorBatch(
        Seq(v(21L, 0.05, 0.9)).toDF("id", "vec"), 2L, ann, met, queries1,
        cents, k = 2, nProbe = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(mAll.head._3 == 1.0 && mAll.head._4 == 1.0 && mAll.head._5 == 1.0,
      s"exhaustive probe must be exact: ${mAll.toSeq}")
  }

  test("in-batch collapse: duplicate ids WITHIN one micro-batch land as one store row and cannot inflate the metrics") {
    val ann = graft.Staging.dirFor("recall-dup-ann")
    val met = graft.Staging.dirFor("recall-dup-met")
    // the same id arrives twice in ONE trigger (a re-delivered message,
    // the case the cross-epoch anti-join cannot see); id 10 is the
    // query's true nearest neighbor, so a duplicated row would occupy
    // two ranks in both rankings and cross-multiply the metric join
    val b0 = Seq(v(10L, 0.9, 0.1), v(10L, 0.9, 0.1), v(11L, 0.1, 0.9))
      .toDF("id", "vec")
    val m0 = RecallStream.monitorBatch(b0, 0L, ann, met, queries1,
        cents, k = 2, nProbe = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
    val stored = spark.read.parquet(ann).select("id").as[Long].collect().toSeq
    assert(stored.sorted == Seq(10L, 11L),
      s"store ids must stay unique under in-batch duplication: $stored")
    assert(m0.length == 1 && m0.head._2 == 2 && m0.head._3 == 1.0,
      s"exhaustive probe over the collapsed store must audit exactly 1.0: ${m0.toSeq}")
    // conflicting payloads for one id collapse to ONE deterministic row
    val b1 = Seq(v(20L, 0.1, 0.95), v(20L, 0.95, 0.1)).toDF("id", "vec")
    RecallStream.monitorBatch(b1, 1L, ann, met, queries1, cents,
      k = 2, nProbe = 2)
    val kept = spark.read.parquet(ann).filter($"id" === 20L)
      .select("vec").as[Seq[Float]].collect()
    assert(kept.length == 1 && kept.head == Seq(0.1f, 0.95f),
      s"the min-by-vec-order row must win deterministically: $kept")
  }

  test("stream ≡ batch: the epoch metrics equal the batch operators over the accumulated store") {
    val ann = graft.Staging.dirFor("recall-twin-ann")
    val met = graft.Staging.dirFor("recall-twin-met")
    val b0 = Seq(v(10L, 0.9, 0.2), v(11L, 0.1, 0.95)).toDF("id", "vec")
    val b1 = Seq(v(20L, 0.69, 0.71), v(21L, 0.95, 0.05)).toDF("id", "vec")
    RecallStream.monitorBatch(b0, 0L, ann, met, queries1, cents, k = 2, nProbe = 1)
    val streamed = RecallStream.monitorBatch(b1, 1L, ann, met, queries1,
        cents, k = 2, nProbe = 1)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    val sys = IvfIndex.topKIndexed(spark, ann, queries1, cents, k = 2, nProbe = 1)
    val gt = Similarity.bruteForceTopK(queries1,
      spark.read.parquet(ann).select($"id", $"vec"), k = 2)
    val batchSide = Retrieval.rankingMetrics(sys, gt, k = 2)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(streamed == batchSide, "the monitor IS the batch audit over data-so-far")
    // and the metrics sink holds one epoch directory per batch
    assert(spark.read.parquet(met).select("batch").distinct().count() == 2)
  }

  test("graph monitor: clean while coverage holds; a planted unreachable cluster drops the recall row; exhaustive remedy recovers; replay idempotent") {
    val gdir = graft.Staging.dirFor("recall-graph-g")
    val ndir = graft.Staging.dirFor("recall-graph-n")
    val met = graft.Staging.dirFor("recall-graph-met")
    // old cluster near +x; the standing query points into it
    val old = Seq(v(10L, 0.9, -0.1), v(11L, 0.85, 0.05),
      v(12L, 0.95, -0.2), v(13L, 0.8, 0.15))
    // NEW ids chosen so their md5 entry-rank falls AFTER every old id:
    // with entries = 4, the walk's entry points stay in the old cluster
    // across both epochs — deterministic, derived from the same hash
    // the ranking uses
    val oldMaxH = Seq(10L, 11L, 12L, 13L).map(id =>
      Seq(("nnd" + id)).toDF("t")
        .select(graft.ops.Dedup.md5TokenHash60($"t")).as[Long].head()).max
    val newIds = (100L to 160L).filter { id =>
      Seq(("nnd" + id)).toDF("t")
        .select(graft.ops.Dedup.md5TokenHash60($"t")).as[Long].head() > oldMaxH
    }.take(3)
    assert(newIds.size == 3, s"fixture needs 3 late-ranked ids, got $newIds")
    // the new cluster sits at ~+y: far from the old cluster (its k-NN
    // edges stay internal) but CLOSER to a second standing query
    val q2 = Seq((0L, Seq(1.0f, 0.1f)), (1L, Seq(0.5f, 0.86f)))
      .toDF("qid", "qvec")
    val b0 = old.toDF("id", "vec")
    val m0 = RecallStream.monitorGraphBatch(b0, 0L, gdir, ndir, met, q2,
        k = 2, entries = 4, beam = 2, hops = 1, buildK = 2)
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(m0.forall(_._3 == 1.0),
      s"entry coverage = corpus at epoch 0 must audit 1.0: ${m0.toSeq}")
    val b1 = newIds.map(id => v(id, 0.1, 0.95)).toDF("id", "vec")
    val m1 = RecallStream.monitorGraphBatch(b1, 1L, gdir, ndir, met, q2,
        k = 2, entries = 4, beam = 2, hops = 1, buildK = 2)
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    val q1Row = m1.find(_._1 == 1L).get
    assert(q1Row._3 < 1.0,
      s"the monitor must SEE the uncovered new component: ${m1.toSeq}")
    // the remedy the alert calls for: entry coverage ≥ corpus recovers
    val n = spark.read.parquet(ndir).count().toInt
    val mFix = RecallStream.monitorGraphBatch(
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], b1.schema),
        2L, gdir, ndir, met, q2, k = 2, entries = n, beam = 2, hops = 1,
        buildK = 2)
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(mFix.forall(_._3 == 1.0),
      s"exhaustive entry coverage must audit 1.0: ${mFix.toSeq}")
    // replay: re-monitoring epoch 1 reproduces its metrics and leaves
    // the store/index unchanged
    val edgesBefore = spark.read.parquet(s"$gdir/index")
      .select("c", "v").as[(Long, Long)].collect().toSet
    val m1Again = RecallStream.monitorGraphBatch(b1, 1L, gdir, ndir, met,
        q2, k = 2, entries = 4, beam = 2, hops = 1, buildK = 2)
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(m1Again.toSeq == m1.toSeq, "graph-monitor replay must be idempotent")
    assert(spark.read.parquet(s"$gdir/index")
      .select("c", "v").as[(Long, Long)].collect().toSet == edgesBefore)
  }

  test("graph monitor cold start: an empty (or fully-duplicate) first batch emits the empty metrics relation instead of dying on the missing index") {
    val gdir = graft.Staging.dirFor("recall-graph-cold-g")
    val ndir = graft.Staging.dirFor("recall-graph-cold-n")
    val met = graft.Staging.dirFor("recall-graph-cold-met")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Seq(v(0L, 0.0, 0.0)).toDF("id", "vec").schema)
    val m0 = RecallStream.monitorGraphBatch(empty, 0L, gdir, ndir, met,
      queries1, k = 2, entries = 2, beam = 2, hops = 1, buildK = 2)
    assert(m0.isEmpty, "no index yet ⇒ the epoch's metrics are the empty relation")
    assert(spark.read.parquet(s"$met/batch=0").isEmpty,
      "the empty epoch still commits its metrics partition")
    // the first REAL arrivals start the series normally
    val b1 = Seq(v(10L, 0.9, 0.1), v(11L, 0.1, 0.9)).toDF("id", "vec")
    val m1 = RecallStream.monitorGraphBatch(b1, 1L, gdir, ndir, met,
        queries1, k = 2, entries = 2, beam = 2, hops = 1, buildK = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(m1.length == 1 && m1.head._3 == 1.0,
      s"the first real epoch must audit normally: ${m1.toSeq}")
  }

  test("replay idempotence: re-monitoring a committed epoch reproduces its metrics row for row") {
    val ann = graft.Staging.dirFor("recall-replay-ann")
    val met = graft.Staging.dirFor("recall-replay-met")
    val b0 = Seq(v(10L, 0.9, 0.2)).toDF("id", "vec")
    val b1 = Seq(v(20L, 0.2, 0.9)).toDF("id", "vec")
    RecallStream.monitorBatch(b0, 0L, ann, met, queries1, cents, k = 2, nProbe = 2)
    RecallStream.monitorBatch(b1, 1L, ann, met, queries1, cents, k = 2, nProbe = 2)
    val before = spark.read.parquet(met)
      .as[(Long, Long, Double, Double, Double, Int)].collect().toSet
    RecallStream.monitorBatch(b1, 1L, ann, met, queries1, cents, k = 2, nProbe = 2)
    val after = spark.read.parquet(met)
      .as[(Long, Long, Double, Double, Double, Int)].collect().toSet
    assert(after == before, "a replayed epoch must overwrite itself exactly")
  }

  test("a re-crawled id never duplicates in the store (first write wins), so metrics stay in range; small ground truth normalizes to 1.0") {
    val ann = graft.Staging.dirFor("recall-dup-ann")
    val met = graft.Staging.dirFor("recall-dup-met")
    // ONE vector in the store: |gt| = 1 < k = 2 — an exact probe must
    // still read 1.0, not 0.5 (the cold-start normalization)
    val m0 = RecallStream.monitorBatch(
        Seq(v(10L, 0.9, 0.2)).toDF("id", "vec"), 0L, ann, met, queries1,
        cents, k = 2, nProbe = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(m0.head._3 == 1.0 && m0.head._5 == 1.0,
      s"an exact probe over a 1-doc store must audit 1.0: ${m0.toSeq}")
    // id 10 re-arrives (re-crawl) with different coordinates: dropped —
    // the store keeps one row per id and the metrics stay in range
    val m1 = RecallStream.monitorBatch(
        Seq(v(10L, 0.1, 0.9), v(11L, 0.8, 0.1)).toDF("id", "vec"),
        1L, ann, met, queries1, cents, k = 2, nProbe = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(spark.read.parquet(ann).filter($"id" === 10L).count() == 1,
      "first write wins — no duplicate store rows")
    assert(m1.head._2 <= 2 && m1.head._3 == 1.0 && m1.head._5 == 1.0,
      s"exact probe over the deduped store stays exact: ${m1.toSeq}")
  }

  test("live foreachBatch: the monitor runs end-to-end on a real stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val ann = graft.Staging.dirFor("recall-e2e-ann")
    val met = graft.Staging.dirFor("recall-e2e-met")
    val ckpt = graft.Staging.dirFor("recall-e2e-ckpt")
    val q = RecallStream.start(mem.toDF().toDF("id", "vec"), ann, met,
      ckpt, queries1, cents, k = 2, nProbe = 2)
    try {
      mem.addData((10L, Seq(0.9f, 0.2f)), (11L, Seq(0.1f, 0.9f)))
      q.processAllAvailable()
      mem.addData((20L, Seq(0.7f, 0.7f)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(met)
      .select("batch", "qid", "recall").as[(Int, Long, Double)].collect()
    assert(rows.length == 2, s"one audit row per epoch: ${rows.toSeq}")
    assert(rows.forall(_._3 == 1.0), "exhaustive probe stays exact on the live path")
  }
}
