package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The committed production seeds ([[SelectedSeeds]]) vs the committed
  * sweep fixture — the regeneration-stability gate: each constant must
  * BE the argmax of its family's sf0.1 sweep slice (ties to candidate
  * order), so a regenerated sweep that moves an argmax fails here
  * until the constant (and every oracle replaying it) moves with it. */
class SelectedSeedsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sweep = spark.read
    .parquet(s"${graft.Tables.fixturesDir}/quantizer_seed_sweep.parquet")

  test("every committed seed is its family's argmax over the committed sf0.1 sweep") {
    val order = graft.tools.SelectQuantizerSeeds.CandidateSeeds.zipWithIndex.toMap
    val slice = sweep.filter(col("sf") === "sf0.1")
      .select("family", "seed", "recall10")
      .as[(String, String, Double)].collect()
    assert(slice.nonEmpty, "sweep fixture must carry an sf0.1 slice")
    for ((family, committed) <- SelectedSeeds.byFamily) {
      val fam = slice.filter(_._1 == family)
      assert(fam.length ==
        graft.tools.SelectQuantizerSeeds.CandidateSeeds.length,
        s"$family: sweep must cover the full candidate set")
      val best = fam.minBy { case (_, sd, r) => (-r, order(sd)) }
      assert(committed == best._2,
        s"$family: committed seed $committed is not the sweep argmax ${best._2} (recall ${best._3})")
    }
  }

  test("the selection moved the round-18 outliers off their defaults") {
    val slice = sweep.filter(col("sf") === "sf0.1")
      .select("family", "seed", "recall10")
      .as[(String, String, Double)].collect()
    def recallAt(family: String, seed: String): Double =
      slice.find(r => r._1 == family && r._2 == seed).get._3
    for (family <- Seq("res", "opq")) {
      val selected = recallAt(family, SelectedSeeds.byFamily(family))
      val default = recallAt(family, "km")
      val mean = slice.filter(_._1 == family).map(_._3).sum /
        graft.tools.SelectQuantizerSeeds.CandidateSeeds.length
      assert(selected >= mean,
        s"$family: selected recall $selected below the sweep mean $mean")
      assert(selected > default,
        s"$family: selection must beat the round-18 default ($default)")
    }
  }
}
