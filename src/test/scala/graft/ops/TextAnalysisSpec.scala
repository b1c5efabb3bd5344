package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count and mean token length") {
    val df = Seq("one two three", "a", "").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      round(TextAnalysis.meanTokenLen($"text"), 2).as("m")).collect()
    assert(got(0).getInt(0) == 3 && got(0).getDouble(1) == 3.67)
    assert(got(1).getInt(0) == 1 && got(1).getDouble(1) == 1.0)
  }

  test("stopword and punctuation ratios") {
    val df = Seq("the cat sat on the mat!").toDF("text")
    val r = df.select(
      round(TextAnalysis.stopwordRatio($"text"), 4).as("s"),
      round(TextAnalysis.punctRatio($"text"), 4).as("p")).head()
    // tokens: the, cat, sat, on, the, mat! → stopwords: the, on, the = 3/6
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 0.0435) // 1 punctuation char of 23

  }

  test("language ID on labeled sentences") {
    val df = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and runs to the hills"),
      ("de", "der hund ist nicht mit der katze und das ist gut"),
      ("es", "el perro es grande y la casa es bonita que bien"),
      ("fr", "le chien est dans la maison et que la vie est belle"),
      ("und", "qwerty zxcvb plmokn")).toDF("want", "text")
    val got = df.select($"want", TextAnalysis.langId($"text").as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"want ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("quality score is in [0,1] and favors natural text") {
    val natural = "the cat sat on a mat and the dog ran to the park with a ball " * 8
    val junk = "!!! ### $$$ %%% ^^^ &&& *** ((( )))"
    val df = Seq(natural, junk).toDF("text")
    val s = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
    assert(s(0) > s(1))
  }

  test("stats projection runs on the harness corpus") {
    val out = TextAnalysis.stats(graft.Tables.documents(spark, sf001))
    assert(out.count() == 500)
    assert(out.columns.contains("fingerprint"))
  }
}
