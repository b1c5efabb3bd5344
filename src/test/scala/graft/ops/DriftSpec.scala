package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("bin ids clamp to the edge bins") {
    val rows = Seq(-5.0, 0.0, 49.9, 50.0, 1999.0, 2000.0, 9999.0).toDF("v")
      .select(Drift.binCol(col("v"), 0.0, 2000.0, 40).as("b"))
      .as[Int].collect().toSeq
    assert(rows == Seq(0, 0, 0, 1, 39, 39, 39))
  }

  test("single group vs itself is exactly zero drift") {
    val df = (1 to 200).map(i => ("a", (i % 37) * 11.0)).toDF("src", "v")
    val out = Drift.driftByGroup(df, "src", col("v"), 0.0, 500.0, 10)
      .collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 0.0, s"psi: ${out.head.getDouble(2)}")
    assert(out.head.getDouble(3) == 0.0, s"ks: ${out.head.getDouble(3)}")
  }

  test("statistics match a hand computation on a crafted 2-bin histogram") {
    // group a: 3 rows in bin 0, 1 in bin 1; group b: 1 and 3.
    // reference (all rows): 4 and 4.
    val df = (Seq.fill(3)(("a", 1.0)) ++ Seq(("a", 9.0)) ++
      Seq(("b", 1.0)) ++ Seq.fill(3)(("b", 9.0))).toDF("src", "v")
    val out = Drift.driftByGroup(df, "src", col("v"), 0.0, 10.0, 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def psi(c: Seq[Long], rc: Seq[Long]): Double = {
      val n = c.sum.toDouble; val nr = rc.sum.toDouble
      val terms = c.indices.map { i =>
        val p = (c(i) + 0.5) / (n + 1.0)
        val q = (rc(i) + 0.5) / (nr + 1.0)
        (p - q) * math.log(p / q)
      }
      BigDecimal(terms.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("a")._1 == 4L && out("b")._1 == 4L)
    assert(out("a")._2 == psi(Seq(3, 1), Seq(4, 4)))
    assert(out("b")._2 == psi(Seq(1, 3), Seq(4, 4)))
    // KS: |3/4 - 4/8| at the first edge
    assert(math.abs(out("a")._3 - 0.25) < 1e-12)
    assert(math.abs(out("b")._3 - 0.25) < 1e-12)
  }

  test("a shifted slice drifts more than a stable one") {
    val rnd = new scala.util.Random(31L)
    val stable = (0 until 500).map(_ => ("stable", 100.0 + rnd.nextGaussian() * 20))
    val ref = (0 until 500).map(_ => ("ref", 100.0 + rnd.nextGaussian() * 20))
    val shifted = (0 until 500).map(_ => ("shifted", 160.0 + rnd.nextGaussian() * 20))
    val df = (stable ++ ref ++ shifted).toDF("src", "v")
    val out = Drift.driftByGroup(df, "src", col("v"), 0.0, 250.0, 25)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // the reference is the full MIXTURE (stable+ref+shifted), so even
    // the stable slice carries real drift vs the bimodal corpus — the
    // shifted slice must still stand clearly above it
    info(s"psi: shifted=${out("shifted")._1} stable=${out("stable")._1}; " +
      s"ks: shifted=${out("shifted")._2} stable=${out("stable")._2}")
    assert(out("shifted")._1 > 2 * out("stable")._1,
      s"psi must flag the shift: ${out("shifted")._1} vs ${out("stable")._1}")
    assert(out("shifted")._2 > out("stable")._2 + 0.2,
      s"ks must flag the shift: ${out("shifted")._2} vs ${out("stable")._2}")
  }
}
