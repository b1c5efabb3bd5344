package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** LSH banding auto-tune ([[Dedup.lshParamsFor]]): the S-curve solve's
  * pinned choices at the gate configurations, its optimality over the
  * divisor lattice, and the coverage property — the auto-chosen
  * config's candidate set contains every true threshold pair on the
  * gate corpus (the `dedup_jaccard_join` oracle corpus). Existing
  * oracles pass explicit (bands) configs and are byte-unchanged. */
class LshParamsSpec extends SparkSpec {
  import spark.implicits._

  test("pinned gate configs: the solve reproduces the committed banding and shifts with the threshold") {
    // the gate corpus config t=0.5/64 hashes: the solve lands on the
    // EXACT committed (16, 4) — the historical hand-pick was optimal
    assert(Dedup.lshParamsFor(0.5, 64) == ((16, 4)))
    // tighter thresholds want longer rows (steeper curve, later knee)
    assert(Dedup.lshParamsFor(0.7, 64) == ((8, 8)))
    assert(Dedup.lshParamsFor(0.9, 64) == ((4, 16)))
    assert(Dedup.lshParamsFor(0.8, 128) == ((8, 16)))
  }

  test("the solve is the argmin of the error-mass objective over all divisor pairs") {
    def detect(s: Double, b: Int, r: Int) =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    def cost(t: Double, b: Int, r: Int): Double = {
      val steps = 1000
      val fp = (0 until steps).map(i =>
        detect((i + 0.5) * t / steps, b, r) * t / steps).sum
      val fn = (0 until steps).map(i =>
        (1.0 - detect(t + (i + 0.5) * (1 - t) / steps, b, r)) * (1 - t) / steps).sum
      0.5 * fp + 0.5 * fn
    }
    for (t <- Seq(0.3, 0.5, 0.7, 0.9); n <- Seq(32, 64, 128)) {
      val (b, r) = Dedup.lshParamsFor(t, n)
      assert(b * r == n, s"(b=$b, r=$r) must factorize n=$n")
      val chosen = cost(t, b, r)
      for (bb <- 1 to n if n % bb == 0)
        assert(chosen <= cost(t, bb, n / bb) + 1e-12,
          s"t=$t n=$n: ($b,$r) beaten by ($bb,${n / bb})")
    }
  }

  test("coverage on the gate corpus: the auto config's verified pairs contain every exact threshold pair") {
    val docs = Tables.documents(spark, sf001)
    val t = 0.5
    val truth = Dedup.prefixJaccardJoin(docs, "doc_id", "text", threshold = t)
      .select("id1", "id2").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    // bands <= 0 → the auto-solve (resolves to the same (16, 4) the
    // explicit gate config uses, so this ALSO witnesses that the
    // auto path changes nothing for the committed threshold)
    val auto = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 0, threshold = t)
      .select("id1", "id2").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(truth.nonEmpty, "gate corpus must have threshold pairs")
    assert(truth.subsetOf(auto),
      s"auto banding missed true pairs: ${(truth -- auto).take(5)}")
  }
}
