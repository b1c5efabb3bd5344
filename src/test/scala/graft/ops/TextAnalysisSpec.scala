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

  test("md5_hash60 equals the conv(substring(md5)) builtin chain") {
    val df = Seq("hello", "", "a", "unicode café 你好", "the quick brown fox")
      .toDF("t")
    val rows = df.select(
      graft.ops.Dedup.md5TokenHash60($"t").as("fast"),
      conv(substring(md5($"t"), 1, 15), 16, 10).cast("long").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("codegen'd token_stats/lang_id equal the declarative HOF formulation") {
    // the byte-scan fast path must be value-identical to the
    // split/filter/aggregate HOF pipeline it replaced, including the
    // empty-token edges of split("\\s+") and codepoint token lengths
    val texts = Seq(
      "the quick brown fox", "  leading ws", "trailing ws  ", "",
      "one", "multi   space\tand\ttabs\nand newlines",
      "unicode café naïve 你好 tokens the", "the the the",
      "der hund ist nicht mit der katze und das ist gut",
      "el perro es grande y la casa es bonita que bien",
      (1 to 300).map(i => if (i % 5 == 0) "the" else s"w$i").mkString(" "))
    val df = texts.toDF("text")
    val stops = TextAnalysis.defaultStopwords
    val toks = split($"text", "\\s+")
    val hofN = size(toks)
    val hofChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val hofStops = size(filter(toks, t => t.isin(stops.map(_.asInstanceOf[Any]): _*)))
    val lowered = transform(toks, t => lower(t))
    val langMarkers = Map(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
      "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de"),
      "fr" -> Seq("le", "la", "les", "est", "et", "que", "dans", "une"),
      "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(filter(lowered, t => t.isin(markers.map(_.asInstanceOf[Any]): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    val hofLang = when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))

    val ts = TextAnalysis.tokenStats($"text")
    df.select(
      ts.getField("n_tokens").as("fn"), hofN.as("hn"),
      ts.getField("total_token_chars").as("fc"), hofChars.as("hc"),
      ts.getField("stopword_hits").as("fs"), hofStops.as("hs"),
      TextAnalysis.langId($"text").as("fl"), hofLang.as("hl"),
      $"text")
      .collect().foreach { r =>
        assert(r.getInt(0) == r.getInt(1), s"n_tokens diverges on '${r.getString(8)}'")
        assert(r.getLong(2) == r.getLong(3), s"chars diverge on '${r.getString(8)}'")
        assert(r.getInt(4) == r.getInt(5), s"stop hits diverge on '${r.getString(8)}'")
        assert(r.getString(6) == r.getString(7), s"lang diverges on '${r.getString(8)}'")
      }
  }
}
