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
    // the fit is uncalibrated by construction (no Platt/temperature
    // step), so the assertion is sanity, not quality: the table must
    // yield a usable finite number well inside [0, 1]
    assert(ece >= 0.0 && ece < 0.5, s"implausible ECE $ece")
  }
}
