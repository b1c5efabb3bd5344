package graft

/** SQL surface: the custom expressions are usable from spark.sql once
  * registered (same builders the session-extension path injects). */
class GraftExtensionsSpec extends SparkSpec {

  test("custom functions callable from SQL") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq("""{"a":{"b":1},"c":2}""").toDF("j").createOrReplaceTempView("t")
    val p = spark.sql("SELECT json_project(j, 'a.b') AS p FROM t").head().getString(0)
    assert(p == """{"a":{"b":1}}""")
    val m = spark.sql("SELECT json_merge_shallow('{\"x\":1}', '{\"y\":2}') AS m").head().getString(0)
    assert(m == """{"x":1,"y":2}""")
    val h = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    assert(h == "abc".getBytes("UTF-8").foldLeft(0L)((a, b) => a * 31 + (b & 0xff)))
  }

  test("round-2/3 expressions reachable from SQL (Scala/SQL surface parity)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(("a b c d", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("t", "x", "y").createOrReplaceTempView("v")
    val ng = spark.sql("SELECT ngram_hashes(t, 2) AS h FROM v").head().getSeq[Long](0)
    val ngScala = spark.table("v")
      .select(graft.functions.functions.ngram_hashes($"t", 2)).head().getSeq[Long](0)
    assert(ng == ngScala && ng.size == 3)
    assert(spark.sql("SELECT dot_product(x, y) AS d FROM v").head().getDouble(0) == 11.0)
    val cos = spark.sql("SELECT cosine_sim(x, x) AS c FROM v").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)
    assert(spark.sql("SELECT json_valid('{\"a\":1}') AS v").head().getBoolean(0))
    assert(!spark.sql("SELECT json_valid('nope{') AS v").head().getBoolean(0))
    val ts = spark.sql("SELECT token_stats('the cat sat') AS s").head().getStruct(0)
    assert(ts.getInt(0) == 3 && ts.getLong(1) == 9L && ts.getInt(2) == 1)
    assert(spark.sql("SELECT lang_id('der hund ist nicht mit der katze und') AS l")
      .head().getString(0) == "de")
    assert(spark.sql("""SELECT to_yaml('{"kind":"Pod","n":2}') AS y""").head().getString(0)
      == "kind: Pod\nn: 2\n")
  }

  test("extension class exposes the same function set") {
    assert(GraftExtensions.all.map(_._1).toSet ==
      Set("json_project", "json_merge_shallow", "rolling_hash", "json_valid",
        "ngram_hashes", "dot_product", "cosine_sim", "token_stats", "lang_id",
        "to_yaml"))
    // the class applies without throwing against fresh extensions
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
