package graft.ops

import graft.SparkSpec

/** Column profiler ([[Profile.profile]]): exact statistics, null
  * handling, and the approx path's plan shape (no multi-distinct
  * Expand).
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Option(1L), Option("en")),
    (Option(2L), Option("de")),
    (Option(2L), Option.empty[String]),
    (Option(3L), Option("en"))).toDF("id", "lang")

  test("exact profile: counts, ndv, lexicographic min/max") {
    val p = Profile.profile(df, Seq("id", "lang")).orderBy("col_name").collect()
    val id = p(0); val lang = p(1)
    assert(id.getAs[String]("col_name") == "id")
    assert(id.getAs[Long]("n_nonnull") == 4 && id.getAs[Long]("ndv") == 3)
    assert(id.getAs[String]("min_val") == "1" && id.getAs[String]("max_val") == "3")
    assert(lang.getAs[String]("col_name") == "lang")
    assert(lang.getAs[Long]("n_nonnull") == 3 && lang.getAs[Long]("ndv") == 2)
    assert(lang.getAs[String]("min_val") == "de" && lang.getAs[String]("max_val") == "en")
  }

  test("duplicate columns are rejected; dotted names profile correctly") {
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("id", "id"))
    }
    val dotted = Seq((1L, "x"), (2L, "y")).toDF("doc.id", "lang tag")
    val p = Profile.profile(dotted, Seq("doc.id", "lang tag"))
      .orderBy("col_name").collect()
    assert(p.map(_.getAs[String]("col_name")).toSeq == Seq("doc.id", "lang tag"))
    assert(p.forall(_.getAs[Long]("n_nonnull") == 2L))
    assert(p(0).getAs[String]("min_val") == "1" &&
      p(0).getAs[String]("max_val") == "2")
  }

  test("profileWithQuantiles: exact below k, null quantiles for non-numeric, nulls excluded") {
    val df = Seq((1L, "en", Option(10L)), (2L, "de", Option(30L)),
      (3L, "en", Option(20L)), (4L, "fr", Option.empty[Long]))
      .toDF("id", "lang", "len")
    val p = Profile.profileWithQuantiles(df, Seq("id", "lang", "len"),
        Seq("id", "len"), "id", seed = "t", k = 64,
        qs = Seq("p50" -> 0.5, "p100" -> 1.0))
      .orderBy("col_name").collect()
    val byName = p.map(r => r.getAs[String]("col_name") -> r).toMap
    // 4 rows < k → the sample IS the population: exact quantiles
    assert(byName("id").getAs[Double]("p50") == 2.0 &&
      byName("id").getAs[Double]("p100") == 4.0)
    // len: nulls excluded → sample {10,20,30}, p50 = 20
    assert(byName("len").getAs[Double]("p50") == 20.0 &&
      byName("len").getAs[Long]("m_sample") == 3L)
    assert(byName("len").getAs[Long]("n_nonnull") == 3L,
      "profile half agrees on the non-null population")
    // non-numeric column: profiled, quantiles null
    assert(byName("lang").isNullAt(byName("lang").fieldIndex("p50")))
    intercept[IllegalArgumentException] {
      Profile.profileWithQuantiles(df, Seq("id"), Seq("len"), "id", "t", 4,
        Seq("p50" -> 0.5)) // quantile col not profiled
    }
  }

  test("approx path drops the multi-distinct Expand; values agree at small ndv") {
    val exact = Profile.profile(df, Seq("id", "lang"))
    val approx = Profile.profile(df, Seq("id", "lang"), approxNdv = true)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"),
      "exact multi-distinct is expected to expand")
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "HLL path must be a single un-expanded pass")
    assert(approx.orderBy("col_name").collect()
      .map(_.getAs[Long]("ndv")).toSeq == Seq(3L, 2L))
  }
}
