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

  test("extension class exposes the same function set") {
    assert(GraftExtensions.all.map(_._1).toSet ==
      Set("json_project", "json_merge_shallow", "rolling_hash"))
    // the class applies without throwing against fresh extensions
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
