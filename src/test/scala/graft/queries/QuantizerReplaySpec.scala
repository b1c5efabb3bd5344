package graft.queries

import graft.SparkSpec

/** The quantizer-replay oracle layer's one embedded-literal model
  * parameter: [[QuantizerReplay.OpqOrder]] must be EXACTLY the
  * allocation [[graft.ops.Opq.allocate]] computes from the committed
  * eigenbasis fixture — the oracle SQL is built without a
  * SparkSession, so the order is a literal, and this spec is what
  * makes drift (a fixture regen, an allocate change) a test failure
  * instead of a silent oracle mismatch. */
class QuantizerReplaySpec extends SparkSpec {

  test("the embedded OPQ allocation order is allocate() over the committed fixture, verbatim") {
    val basis = graft.ops.Pca.loadBasis(spark,
      s"${graft.Tables.fixturesDir}/pca_basis.parquet")
    val order = graft.ops.Opq.allocate(
      basis.sortBy(_.component).map(_.eigenvalue), 8)
    assert(order == QuantizerReplay.OpqOrder,
      s"embedded OpqOrder drifted from the fixture allocation:\n$order")
    assert(QuantizerReplay.OpqOrder.sorted == (0 until 64),
      "the order must be a permutation of the 64 components")
  }
}
