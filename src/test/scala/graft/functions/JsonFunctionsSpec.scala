package graft.functions

import graft.SparkSpec
import graft.functions.functions._
import org.apache.spark.sql.functions._

/** Pins the nested-field projection semantics the reference asserts in
  * TestFilterFields (/root/reference/syncer/controllers/
  * krmsyncer_controller_test.go:517-616): dotted-path copy, sibling
  * exclusion, full-subtree copy across primitive/int/bool/nested-map/
  * heterogeneous-list values, missing paths silently skipped.
  */
class JsonFunctionsSpec extends SparkSpec {

  // The reference's projection fixture (controller_test.go:523-593).
  private val specJson =
    """{"resourceID":"my-resource","resource":{"ID":"nested"},"other":"x",
      |"primitive":"string-value","integer":42,"boolean":true,
      |"complex":{"nested":{"deep":"deep-value"}},
      |"list":[{"item":1},"simple-item"]}""".stripMargin.replaceAll("\n", "")

  test("dotted path copies subtree, siblings excluded") {
    val out = JsonFunctions.projectPaths(specJson, Seq("resourceID"))
    assert(out == """{"resourceID":"my-resource"}""")
  }

  test("nested dotted path rebuilds intermediate objects") {
    val out = JsonFunctions.projectPaths(specJson, Seq("complex.nested.deep"))
    assert(out == """{"complex":{"nested":{"deep":"deep-value"}}}""")
  }

  test("full-subtree copy preserves all value types") {
    val out = JsonFunctions.projectPaths(specJson, Seq("list", "integer", "boolean"))
    assert(out == """{"list":[{"item":1},"simple-item"],"integer":42,"boolean":true}""")
  }

  test("missing paths silently skipped; nothing found → null") {
    assert(JsonFunctions.projectPaths(specJson, Seq("resourceID", "nope.deep")) ==
      """{"resourceID":"my-resource"}""")
    assert(JsonFunctions.projectPaths(specJson, Seq("nope")) == null)
    assert(JsonFunctions.projectPaths(null, Seq("x")) == null)
  }

  test("mergeShallow: src fields overwrite, dest-only retained") {
    val out = JsonFunctions.mergeShallow("""{"a":1,"b":2}""", """{"b":9,"c":3}""")
    assert(out == """{"a":1,"b":9,"c":3}""")
    assert(JsonFunctions.mergeShallow(null, """{"x":1}""") == """{"x":1}""")
    assert(JsonFunctions.mergeShallow("""{"x":1}""", null) == """{"x":1}""")
  }

  test("json_project as a Column expression") {
    import spark.implicits._
    val df = Seq(specJson).toDF("spec")
    val got = df.select(json_project($"spec", Seq("resourceID")).as("p"))
      .head().getString(0)
    assert(got == """{"resourceID":"my-resource"}""")
  }

  test("rolling_hash matches reference implementation and codegen path") {
    import spark.implicits._
    def refHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val inputs = Seq("", "a", "hello world", "ünïcödé ツ")
    val df = inputs.toDF("s").select(rolling_hash($"s").as("h"))
    assert(df.collect().map(_.getLong(0)).toSeq == inputs.map(refHash))
  }

  test("property: projection of random flat objects keeps exactly the asked keys") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val m = (1 to (1 + rnd.nextInt(8))).map(i =>
        s"k${rnd.nextInt(20)}" -> rnd.nextInt(1000)).toMap
      val o = JsonFunctions.mapper.createObjectNode()
      m.foreach { case (k, v) => o.put(k, v) }
      val asked = rnd.shuffle(m.keys.toList).take(1 + rnd.nextInt(3))
      val out = JsonFunctions.projectPaths(o.toString, asked)
      val parsed = JsonFunctions.mapper.readTree(out)
      assert(asked.forall(k => parsed.get(k).asInt() == m(k)))
      assert(parsed.size() == asked.distinct.size)
    }
  }
}
