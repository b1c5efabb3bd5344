package graft.ops

import graft.SparkSpec
import graft.ops.Pca._
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic planted-structure generator: rank-`struct` signal in
    * the first `struct` coordinates (decaying amplitudes) + small
    * uniform noise everywhere. */
  private def planted(n: Int, dim: Int, structDims: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = Array.tabulate(dim) { j =>
        val noise = (rnd.nextDouble() - 0.5) * 0.02
        val signal =
          if (j < structDims) (rnd.nextDouble() - 0.5) * (2.0 - 0.15 * j)
          else 0.0
        (signal + noise).toFloat
      }
      (i.toLong, v.toSeq)
    }
  }

  test("moments are integer-exact and partitioning-invariant") {
    val df = planted(300, 8, 3, seed = 1L).toDF("id", "v")
    val a = moments(df.coalesce(1), "v", 8)
    val b = moments(df.repartition(7), "v", 8)
    assert(a.n == 300L && b.n == 300L)
    assert(a.m.sameElements(b.m), "exact Long moments must not depend on partitioning")
  }

  test("jacobi recovers a hand-built spectrum") {
    // A = Q diag(5, 2, 1) Qᵀ with a known rotation in the (0,1) plane
    val c = math.cos(0.3); val s = math.sin(0.3)
    val q = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val d = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * d(k) * q(j)(k)).sum)
    val (evals, evecs) = jacobiEigen(a)
    val order = (0 until 3).sortBy(k => -evals(k))
    assert(order.zip(d.indices).forall { case (k, e) => math.abs(evals(k) - d(e)) < 1e-10 })
    // leading eigenvector ≡ first column of Q up to sign
    val top = canonicalSign(evecs(order.head))
    val dot = top(0) * q(0)(0) + top(1) * q(1)(0) + top(2) * q(2)(0)
    assert(math.abs(math.abs(dot) - 1.0) < 1e-10)
  }

  test("trained basis finds the planted subspace and orders variance") {
    val df = planted(600, 16, 4, seed = 7L).toDF("id", "v")
    val basis = trainBasis(df, "v", 16)
    val evs = basis.map(_.eigenvalue)
    assert(evs == evs.sortBy(-_), "eigenvalues must be descending")
    // the 4 planted directions carry ~0.27+ variance each vs 3e-5 noise
    assert(evs(3) > 100 * evs(4),
      s"planted rank-4 structure should dominate: ${evs.take(6)}")
    // top-4 eigenvectors live in the planted coordinate span
    basis.take(4).foreach { c =>
      val inSpan = c.evec.take(4).map(x => x * x).sum
      assert(inSpan > 0.999, s"component ${c.component} leaks out of the span: $inSpan")
    }
  }

  test("training is bit-deterministic") {
    val df = planted(200, 8, 2, seed = 3L).toDF("id", "v")
    val b1 = trainBasis(df.repartition(5), "v", 8)
    val b2 = trainBasis(df.coalesce(1), "v", 8)
    assert(graft.tools.TrainPca.basisMd5(b1) == graft.tools.TrainPca.basisMd5(b2))
  }

  test("projection: centered coordinates, zero-exchange plan") {
    val df = planted(100, 8, 2, seed = 9L).toDF("id", "v")
    val basis = trainBasis(df, "v", 8)
    val proj = df.select(projectCol(col("v"), basis, 4).as("p"))
    // centered: each projected coordinate means ≈ 0 (quantization-bounded)
    val meansRow = proj
      .select((0 until 4).map(j => avg(col("p").getItem(j)).as(s"m$j")): _*)
      .collect().head
    (0 until 4).foreach(j => assert(math.abs(meansRow.getDouble(j)) < 1e-3,
      s"coordinate $j not centered: ${meansRow.getDouble(j)}"))
    // shuffle-free scan: no Exchange anywhere in the projection plan
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("residual is the tail energy and flags off-manifold rows") {
    val inSpan = planted(200, 16, 4, seed = 17L)
    // one corrupt row: all its energy in coordinate 10, far outside the
    // planted rank-4 span
    val outlier = (200L, Array.tabulate(16)(j =>
      if (j == 10) 3.0f else 0.0f).toSeq)
    val df = (inSpan :+ outlier).toDF("id", "v")
    val basis = trainBasis(df, "v", 16)
    val res = df.select(col("id"),
        residual2Col(col("v"), basis, 4).as("r2"),
        // completeness identity: rank-0 residual == full centered norm
        residual2Col(col("v"), basis, 0).as("total"),
        projectCol(col("v"), basis, 4).as("p"))
      .withColumn("kept", expr("aggregate(p, 0d, (a, x) -> a + x * x)"))
      .collect()
    res.foreach { r =>
      assert(math.abs(r.getDouble(2) - (r.getDouble(1) + r.getDouble(4))) < 1e-9,
        "total energy must split exactly into kept + residual")
    }
    val byId = res.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val planted99 = byId.filter(_._1 != 200L).values.max
    assert(byId(200L) > 50 * planted99,
      s"off-span row must dominate the residual: ${byId(200L)} vs $planted99")
  }

  test("projected-space top-k keeps neighbors when structure is low-rank") {
    val data = planted(400, 16, 4, seed = 11L)
    val df = data.toDF("id", "v")
    val basis = trainBasis(df, "v", 16)
    val queries = df.filter(col("id") < 5)
      .select(col("id").as("qid"), col("v").as("qvec"))
    val corpus = df.filter(col("id") >= 5)
      .select(col("id").as("id"), col("v").as("vec"))
    val projected = topKProjected(queries, corpus, basis, r = 4, k = 10)
      .select("qid", "id").as[(Long, Long)].collect().groupBy(_._1)
    // full-space exact L2 reference, driver-side
    val vecs = data.toMap
    val recall = (0L until 5L).map { q =>
      val qv = vecs(q)
      val full = vecs.keys.filter(_ >= 5L).toSeq
        .sortBy(id => (vecs(id), qv).zipped.map((a, b) => (a - b) * (a - b)).sum)
        .take(10).toSet
      projected(q).map(_._2).count(full.contains).toDouble / 10.0
    }
    assert(recall.sum / 5 >= 0.9,
      s"rank-4 projection of rank-4 data should keep ≥0.9 recall, got $recall")
  }
}
