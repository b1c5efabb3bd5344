package graft.functions

import graft.{SparkSpec, Tables}
import graft.ops.{IvfIndex, PqIndex}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Centroids-as-data expressions (round-10 directive #3).
  *
  * Two claims, each pinned:
  *   - PARITY: the reference-object loop expressions select the same
  *     cells / codes / tables as the k-literal-unrolled formulations
  *     they replaced (the old column programs are reconstructed inline
  *     here as the oracle, over the real embeddings table);
  *   - SCALE: k=256 quantizers — the size at which literal unrolling
  *     starts threatening the JVM 64 KB codegen method cap — train and
  *     assign with whole-stage codegen PRESENT and COMPILING
  *     (`spark.sql.codegen.fallback=false` turns silent interpreted
  *     fallback into a hard failure for the duration of the test).
  */
class CentroidExprsSpec extends SparkSpec {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"
  private lazy val emb = Tables.embeddings(spark, sf01)
    .select($"vec_id".as("id"), $"embedding".as("vec"))

  // ---- the OLD literal-unrolled formulations, verbatim, as oracles ----

  private def litVec(v: Array[Double]): Column =
    array(v.toIndexedSeq.map(lit): _*)
  private def dotD(a: Column, b: Column): Column = functions.dot_product(a, b)

  private def oldCosToCentroid(vec: Column, centroid: Array[Double]): Column = {
    val norm = math.sqrt(centroid.map(x => x * x).sum)
    val unit = centroid.map(_ / (if (norm == 0) 1.0 else norm))
    dotD(vec, litVec(unit)) / sqrt(dotD(vec, vec))
  }

  private def oldBestCell(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(oldCosToCentroid(vec, c).as("s"), lit(i).as("i"))
    }
    array_max(array(scored.toIndexedSeq: _*)).getField("i")
  }

  private def oldProbeCells(vec: Column, centroids: Array[Array[Double]],
      nProbe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(oldCosToCentroid(vec, c).as("s"), lit(i).as("i"))
    }
    val sorted = array_sort(array(scored.toIndexedSeq: _*))
    slice(transform(sorted, s => s.getField("i")), -nProbe, nProbe)
  }

  private def oldEncode(vec: Column, cb: PqIndex.Codebooks): Column =
    array((0 until cb.m).map { mi =>
      val s = slice(vec, mi * cb.dsub + 1, cb.dsub)
      val scored = cb.books(mi).zipWithIndex.map { case (c, i) =>
        struct(dotD(s, litVec(c)).as("s"), lit(i).as("i"))
      }
      array_max(array(scored.toIndexedSeq: _*)).getField("i")
    }: _*)

  private def oldLutFlat(qvec: Column, cb: PqIndex.Codebooks): Column =
    flatten(array((0 until cb.m).map { mi =>
      val s = slice(qvec, mi * cb.dsub + 1, cb.dsub)
      array(cb.books(mi).toIndexedSeq.map(c => dotD(s, litVec(c))): _*)
    }: _*))

  // ---- parity on real embeddings, k=8 (the catalog configuration) ----

  private lazy val cents8 = IvfIndex.train(emb, "id", "vec", k = 8)
  private lazy val cb8 = PqIndex.train(emb, "id", "vec", m = 8, k = 8)

  test("best_cell matches the literal-unrolled formulation") {
    val got = emb.select($"id", IvfIndex.bestCell($"vec", cents8).as("c"))
      .as[(Long, Int)].collect().toMap
    val want = emb.select($"id", oldBestCell($"vec", cents8).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got == want)
    assert(got.values.toSet.size > 1, "degenerate single-cell assignment")
  }

  test("probe_cells matches the literal-unrolled formulation, incl. order") {
    val got = emb.select($"id", IvfIndex.probeCells($"vec", cents8, 3).as("p"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = emb.select($"id", oldProbeCells($"vec", cents8, 3).as("p"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == want)
  }

  test("pq_encode matches the literal-unrolled formulation") {
    val got = emb.select($"id", PqIndex.encode($"vec", cb8).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = emb.select($"id", oldEncode($"vec", cb8).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == want)
  }

  test("pq_lut (flat) matches the literal-unrolled tables") {
    val got = emb.limit(5).select($"id", PqIndex.lut($"vec", cb8).as("l"))
      .as[(Long, Seq[Double])].collect().toMap
    val want = emb.limit(5).select($"id", oldLutFlat($"vec", cb8).as("l"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got == want)
  }

  test("degenerate vectors keep the all-null-tie selection (last indices)") {
    val k = cents8.length
    val bad = Seq((1L, Seq(1.0f, 2.0f)), // wrong dim
      (2L, Seq.fill(64)(0.0f))) // zero vector: all dots 0, tie → last
      .toDF("id", "vec")
    val r = bad.select($"id", IvfIndex.bestCell($"vec", cents8).as("c"),
        IvfIndex.probeCells($"vec", cents8, 2).as("p"))
      .as[(Long, Int, Seq[Int])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((k - 1, Seq(k - 2, k - 1))))
    assert(r(2L) == ((k - 1, Seq(k - 2, k - 1))))
  }

  // ---- scale gate: k=256 stays inside whole-stage codegen ----

  private def withNoCodegenFallback[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  /** WholeStageCodegenExec nodes of a materialized frame's plan. */
  private def codegenStages(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    df.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }
  }

  test("k=256 IVF assignment compiles into whole-stage codegen") {
    withNoCodegenFallback {
      val cents = IvfIndex.train(emb, "id", "vec", k = 256, iters = 1)
      assert(cents.length == 256)
      val assigned = emb.select($"id",
        IvfIndex.bestCell($"vec", cents).as("cell"),
        IvfIndex.probeCells($"vec", cents, 4).as("probes"))
      // collect (NOT count — count would prune the projection away):
      // with fallback=false a codegen compile failure throws here
      val rows = assigned.collect()
      assert(rows.length == 500)
      assert(codegenStages(assigned).nonEmpty,
        s"k=256 assignment fell out of whole-stage codegen:\n" +
          assigned.queryExecution.executedPlan)
      val cells = rows.map(_.getInt(1)).distinct.length
      assert(cells > 32, s"256-cell quantizer collapsed to $cells cells")
    }
  }

  test("k=256 PQ encode + LUT compile into whole-stage codegen") {
    withNoCodegenFallback {
      val cb = PqIndex.train(emb, "id", "vec", m = 8, k = 256, iters = 1)
      assert(cb.k == 256)
      val df = emb.select($"id", PqIndex.encode($"vec", cb).as("codes"),
        PqIndex.lut($"vec", cb).as("lut"))
      val rows = df.collect()
      assert(rows.length == 500)
      assert(codegenStages(df).nonEmpty,
        s"k=256 PQ encode fell out of whole-stage codegen:\n" +
          df.queryExecution.executedPlan)
      assert(rows.map(_.getSeq[Double](2).length).distinct.toSeq == Seq(8 * 256))
    }
  }
}
