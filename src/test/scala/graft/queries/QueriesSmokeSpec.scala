package graft.queries

import graft.{SparkSpec, SparkEntry}

/** t1-style smoke: every declared query runs end-to-end at sf0.001 and
  * every oracle key maps to a declared query. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys ⊆ query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
      val n = df.count()
      assert(n >= 0)
      if (!Set("dedup_minhash_lsh").contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }
}
