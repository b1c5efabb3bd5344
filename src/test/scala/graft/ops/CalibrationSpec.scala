package graft.ops

import graft.SparkSpec

/** Classifier calibration table
  * ([[TextAnalysis.classifierCalibration]]). */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(
    s"${graft.Tables.fixturesDir}/labeled_quality.parquet")
  private lazy val table = TextAnalysis.classifierCalibration(
      docs, "doc_id", "text", "label",
      TextAnalysis.trainedWeightArray(spark), bins = 10)
    .as[(Int, Long, Double, Double)].collect().sortBy(_._1)

  test("bins partition the fixture and stay in range") {
    assert(table.map(_._2).sum == docs.count())
    assert(table.forall(r => r._1 >= 0 && r._1 <= 9))
    assert(table.forall(r => r._3 >= 0.0 && r._3 <= 1.0 &&
      r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("the trained model separates: extreme bins are label-pure, reliability is monotone end-to-end") {
    val bottom = table.head
    val top = table.last
    assert(bottom._1 <= 2 && top._1 >= 7,
      s"confidences collapsed into the middle: bins ${table.map(_._1).toSeq}")
    assert(bottom._4 <= 0.1, s"low-confidence bin should be mostly negatives: $bottom")
    assert(top._4 >= 0.9, s"high-confidence bin should be mostly positives: $top")
  }

  test("expected calibration error is finite and reported") {
    val n = table.map(_._2).sum.toDouble
    val ece = table.map { case (_, nb, conf, pos) =>
      (nb / n) * math.abs(pos - conf)
    }.sum
    info(f"ECE over ${table.length} occupied bins: $ece%.4f")
    // the raw table is uncalibrated by construction; the temperature
    // fit below is the correction step. The raw assertion is sanity,
    // not quality: a usable finite number well inside [0, 1]
    assert(ece >= 0.0 && ece < 0.5, s"implausible ECE $ece")
  }

  private lazy val weights = TextAnalysis.trainedWeightArray(spark)
  private lazy val scored = TextAnalysis
    .classifierScoreInline(docs, "doc_id", "text", weights)
    .join(docs.select($"doc_id".as("id"), $"label"), Seq("id"))

  test("temperature fit: grid contains T=1, so fitted NLL can never exceed raw NLL") {
    val nll = TextAnalysis.temperatureNll(scored)
      .as[(Double, Double)].collect().toMap
    assert(nll.contains(1.0), "grid must contain the identity temperature")
    val (tFit, nllFit) = TextAnalysis.fitTemperature(scored)
      .as[(Double, Double)].collect().head
    info(f"fitted T=$tFit%.3f nll=$nllFit%.6f vs raw nll=${nll(1.0)}%.6f")
    assert(nllFit <= nll(1.0))
    assert(tFit >= 0.25 && tFit <= 3.2, s"T outside the grid: $tFit")
  }

  test("the re-audited table under the fitted temperature has strictly lower ECE") {
    def ece(t: org.apache.spark.sql.DataFrame): Double =
      TextAnalysis.calibrationEce(t).as[Double].collect().head
    val raw = ece(TextAnalysis.classifierCalibration(
      docs, "doc_id", "text", "label", weights))
    val fitted = ece(TextAnalysis.classifierCalibrationFitted(
      docs, "doc_id", "text", "label", weights))
    info(f"ECE raw=$raw%.6f fitted=$fitted%.6f")
    // the committed fixture is separable, so the NLL-optimal T sharpens
    // toward the grid floor and the reliability gap closes outright
    assert(fitted < raw,
      s"temperature fit must improve calibration on the committed fixture: $fitted !< $raw")
  }

  test("Platt fit: identity on the grid, never worse than raw, beats temperature (extra offset dof)") {
    val nll = TextAnalysis.plattNll(scored)
    val raw = nll.filter($"a" === 1.0 && $"b" === 0.0)
      .select("nll").as[Double].collect()
    assert(raw.length == 1, "identity (a=1, b=0) must sit on the grid")
    val (a, b, nllP) = TextAnalysis.fitPlatt(scored)
      .as[(Double, Double, Double)].collect().head
    val (_, nllT) = TextAnalysis.fitTemperature(scored)
      .as[(Double, Double)].collect().head
    info(f"Platt (a=$a%.3f, b=$b%.2f) nll=$nllP%.6f vs temperature nll=$nllT%.6f, raw=${raw.head}%.6f")
    assert(nllP <= raw.head)
    // the A grid spans the temperature grid's full reciprocal range and
    // B adds a free offset — up to grid quantization the 2-parameter
    // family can only improve
    assert(nllP <= nllT + 1e-6,
      s"Platt must not lose to its 1-parameter special case: $nllP vs $nllT")
    assert(a >= 0.25 && a <= 4.0 && b >= -2.0 && b <= 2.0)
  }

  test("Platt re-audit table: ECE ≤ the temperature re-audit's + ε, table partitions the fixture") {
    def ece(t: org.apache.spark.sql.DataFrame): Double =
      TextAnalysis.calibrationEce(t).as[Double].collect().head
    val tFit = ece(TextAnalysis.classifierCalibrationFitted(
      docs, "doc_id", "text", "label", weights))
    val pTab = TextAnalysis.classifierCalibrationPlattFitted(
      docs, "doc_id", "text", "label", weights)
    val pFit = ece(pTab)
    info(f"ECE temperature-fitted=$tFit%.6f platt-fitted=$pFit%.6f")
    // both fits minimize NLL, not ECE, so the 2-parameter family is
    // only guaranteed better in NLL — the pin allows grid-quantization
    // slack on the ECE side
    assert(pFit <= tFit + 0.02,
      s"Platt re-audit should not lose to temperature beyond grid slack: $pFit vs $tFit")
    val rows = pTab.as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._2).sum == docs.count())
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
  }

  test("saturated scores: the NLL clamp keeps every term finite (no silent NULL drop)") {
    // scores far past the sigmoid's double saturation point (|z| > 40):
    // without the clamp Spark's ln(0) → NULL silently removes the term
    // and the per-T sums collapse to the few unsaturated rows
    val extreme = Seq((1L, 60.0, 1L), (2L, -60.0, 0L), (3L, 60.0, 0L),
        (4L, 0.5, 1L))
      .toDF("id", "score", "label")
    val nll = TextAnalysis.temperatureNll(extreme)
      .as[(Double, Double)].collect()
    assert(nll.nonEmpty && nll.forall(r => !r._2.isNaN),
      "every grid NLL must be a finite number")
    // the mislabeled saturated row (id 3) must DOMINATE the sum — its
    // clamped −ln(ε) ≈ 34.5 per unit count — not vanish from it
    val atOne = nll.toMap.apply(1.0)
    assert(atOne > 30.0, s"saturated mislabel must contribute ~-ln(eps): $atOne")
    val platt = TextAnalysis.plattNll(extreme).count()
    assert(platt == 151 * 41, "full (a, b) grid must evaluate finite")
  }

  test("isotonic fit: PAV matches the hand-pooled blocks, step map is monotone non-decreasing") {
    // y = [1, 0, 0, 1, 1] over ascending scores: PAV pools the leading
    // violator run [1,0,0] to 1/3, then [1,1] stays at 1.0
    val hand = Seq((1L, 0.1, 1L), (2L, 0.2, 0L), (3L, 0.3, 0L),
      (4L, 0.4, 1L), (5L, 0.5, 1L)).toDF("id", "score", "label")
    val fit = TextAnalysis.fitIsotonic(hand).sortBy(_._1)
    assert(fit.map(_._1) == Seq(0.1, 0.2, 0.3, 0.4, 0.5))
    assert(fit.map(_._2) == Seq(0.333333, 0.333333, 0.333333, 1.0, 1.0),
      fit.toString)
    // fixture-scale fit: monotone in z everywhere (the PAV invariant)
    val big = TextAnalysis.fitIsotonic(scored).sortBy(_._1)
    assert(big.sliding(2).forall(p => p.head._2 <= p.last._2),
      "isotonic map must be non-decreasing")
    assert(big.forall(p => p._2 >= 0.0 && p._2 <= 1.0))
  }

  test("isotonic re-audit table: partitions the fixture, ECE at or below the raw table's") {
    def ece(t: org.apache.spark.sql.DataFrame): Double =
      TextAnalysis.calibrationEce(t).as[Double].collect().head
    val raw = ece(TextAnalysis.classifierCalibration(
      docs, "doc_id", "text", "label", weights))
    val tab = TextAnalysis.classifierCalibrationIsotonic(
      docs, "doc_id", "text", "label", weights)
    val iso = ece(tab)
    info(f"ECE raw=$raw%.6f isotonic=$iso%.6f")
    assert(iso <= raw,
      s"the non-parametric fit must not lose to no fit at all: $iso vs $raw")
    val rows = tab.as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._2).sum == docs.count())
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
  }

  test("fit is deterministic and the fitted table still partitions the fixture") {
    val a = TextAnalysis.fitTemperature(scored).as[(Double, Double)].collect().head
    val b = TextAnalysis.fitTemperature(scored).as[(Double, Double)].collect().head
    assert(a == b)
    val tab = TextAnalysis.classifierCalibrationFitted(
        docs, "doc_id", "text", "label", weights)
      .as[(Int, Long, Double, Double)].collect()
    assert(tab.map(_._2).sum == docs.count())
    assert(tab.forall(r => r._1 >= 0 && r._1 <= 9))
  }
}
