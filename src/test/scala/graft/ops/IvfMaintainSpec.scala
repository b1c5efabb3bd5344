package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The drift-triggered retrain loop ([[IvfMaintain]]): same-distribution
  * epochs must NOT trip the trigger, a planted distribution shift must,
  * probes must stay consistent through the crash-safe swap, and a
  * replayed epoch must leave the store unchanged. */
class IvfMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic cluster around axis `base`: 10 on the axis plus a
    * small jitter everywhere — Lloyd separates these trivially. */
  private def around(base: Int, n: Int, idOff: Long): DataFrame =
    (0 until n).map { i =>
      (idOff + i, Array.tabulate(Dim)(j =>
        (if (j == base) 10f else 0f) + ((i * 7 + j * 3) % 5) * 0.1f))
    }.toDF("id", "vec")

  private def probeAll(path: String, queries: DataFrame) =
    IvfMaintain.topK(spark, path, queries, k = 3, nProbe = 2)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet

  test("same-distribution epochs stay under the trigger; a planted shift retrains and swaps crash-safely") {
    val path = graft.Staging.dirFor("ivf-maintain")
    IvfMaintain.init(around(0, 20, 0L).union(around(1, 20, 100L)),
      path, k = 2, iters = 5, seed = "kmT")
    val q0 = IvfMaintain.quantizerOf(spark, path)
    assert(q0.map(_.zipWithIndex.maxBy(_._1)._2).toSet == Set(0, 1),
      s"init training must separate the two planted modes: ${q0.map(_.toSeq).toSeq}")

    // epoch 1: same mixture — no retrain, quantizer byte-identical
    val r1 = IvfMaintain.appendEpoch(
      around(0, 10, 200L).union(around(1, 10, 300L)), path, epoch = 1L,
      seed = "kmT")
    assert(!r1.retrained && r1.psi < IvfMaintain.DefaultPsiThreshold &&
      r1.cosDrop < IvfMaintain.DefaultCosDropThreshold,
      s"same distribution must not trip either signal: $r1")
    assert(IvfMaintain.quantizerOf(spark, path).map(_.toSeq).toSeq ==
      q0.map(_.toSeq).toSeq, "quantizer must stay frozen below the trigger")

    // epoch 2: a NEW mode (axis 2) — trigger trips, store retrains
    // (a stale .live-tmp from a "crashed" earlier swap must be clobbered)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/.live-tmp/junk"))
    val r2 = IvfMaintain.appendEpoch(around(2, 30, 400L), path, epoch = 2L,
      seed = "kmT")
    // axis-2 vectors spread EVENLY over the two existing cells — the
    // occupancy histogram is blind to this shift; the QUALITY signal
    // (mean best-cell cosine collapse) is what must catch it
    assert(r2.retrained && r2.cosDrop >= IvfMaintain.DefaultCosDropThreshold,
      s"an off-manifold mode must trip the quality trigger: $r2")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/.live-tmp")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/.live-aside")),
      "swap must leave no tmp/aside residue")
    val q2 = IvfMaintain.quantizerOf(spark, path)
    assert(q2.map(_.toSeq).toSeq != q0.map(_.toSeq).toSeq, "quantizer moved")

    // probes through the swapped store: exhaustive probe ≡ brute force
    // over everything accepted so far
    val queries = Seq((0L, Array.tabulate(Dim)(j => if (j == 2) 1f else 0f)),
      (1L, Array.tabulate(Dim)(j => if (j == 0) 1f else 0f)))
      .toDF("qid", "qvec")
    val got = probeAll(path, queries)
    val corpus = spark.read.parquet(s"$path/live/blocks")
      .select(col("id"), col("vec"))
    val want = Similarity.bruteForceTopK(queries, corpus, k = 3)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == want, "exhaustive managed probe must equal brute force")

    // replay of epoch 2: store rows, quantizer, and probes all unchanged
    val nBefore = corpus.count()
    IvfMaintain.appendEpoch(around(2, 30, 400L), path, epoch = 2L,
      seed = "kmT")
    assert(spark.read.parquet(s"$path/live/blocks").count() == nBefore,
      "replayed epoch must not duplicate rows")
    assert(probeAll(path, queries) == got, "replay must not change probes")
  }

  test("crash windows of the swap recover to a coherent quantizer+data pair") {
    val path = graft.Staging.dirFor("ivf-maintain-recover")
    IvfMaintain.init(around(0, 10, 0L).union(around(1, 10, 50L)),
      path, k = 2, iters = 5, seed = "kmT")
    val q0 = IvfMaintain.quantizerOf(spark, path).map(_.toSeq).toSeq
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // crash between the two renames: live moved aside, tmp not yet in —
    // next access must restore the full OLD pair
    assert(fs.rename(p(s"$path/live"), p(s"$path/.live-aside")))
    assert(IvfMaintain.quantizerOf(spark, path).map(_.toSeq).toSeq == q0,
      "aside-only layout must recover to the old quantizer")
    assert(fs.exists(p(s"$path/live")) && !fs.exists(p(s"$path/.live-aside")))
    // crash after tmp renamed in, aside not yet deleted — the NEW pair
    // wins and the aside residue is swept
    fs.mkdirs(p(s"$path/.live-aside/junk"))
    assert(IvfMaintain.quantizerOf(spark, path).map(_.toSeq).toSeq == q0)
    assert(!fs.exists(p(s"$path/.live-aside")),
      "a live+aside layout must sweep the aside residue")
  }
}
