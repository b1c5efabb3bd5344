package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed linear classifier ([[TextAnalysis.classifierScore]]):
  * scores replayed token-by-token in pure Scala (independent md5
  * path), weight join stays broadcast.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 1024

  /** Pure-Scala replay of the scoring pipeline: md5 → first 15 hex
    * digits as a long → bucket → Knuth-mix stub weight. */
  private def expected(text: String): (Long, Double, Boolean) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split("\\s+").toSeq
    val raw = toks.map { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      ((h % dim) * 2654435761L) % 1000 - 500
    }.sum
    val n = toks.size.toLong
    (n, raw / (n * 1000.0), raw > 0)
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "spark shuffles when it must and broadcasts when it can"),
    (3L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")

  private lazy val scored = TextAnalysis.classifierScore(
    docs, "doc_id", "text", TextAnalysis.hashedStubWeights(spark, dim), dim)

  test("scores match an independent pure-Scala md5 replay") {
    val got = scored.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score"),
        r.getAs[Boolean]("keep")))).toMap
    for ((id, text) <- Seq(1L -> docs, 2L -> docs)) {
      val t = Seq("the quick brown fox jumps over the lazy dog",
        "spark shuffles when it must and broadcasts when it can")(id.toInt - 1)
      assert(got(id) == expected(t), s"doc $id")
    }
    // identical texts score identically
    assert(got(1L) == got(3L))
  }

  test("weight relation joins broadcast; tokens reduce before the one doc exchange") {
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast, not shuffle:\n$plan")
  }

  test("inline scan-kernel form matches the relational form exactly") {
    val inline = TextAnalysis.classifierScoreInline(
      docs, "doc_id", "text", TextAnalysis.stubWeightArray(dim))
    val a = scored.orderBy("id").collect().toSeq
    val b = inline.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("inline form is zero-exchange (whole classifier inside the scan)") {
    val inline = TextAnalysis.classifierScoreInline(
      docs, "doc_id", "text", TextAnalysis.stubWeightArray(dim))
    val plan = inline.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  test("null text: row kept, scored as one empty token, inline ≡ relational") {
    val withNull = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rel = TextAnalysis.classifierScore(withNull, "doc_id", "text",
      TextAnalysis.hashedStubWeights(spark, dim), dim).orderBy("id").collect().toSeq
    val inl = TextAnalysis.classifierScoreInline(withNull, "doc_id", "text",
      TextAnalysis.stubWeightArray(dim)).orderBy("id").collect().toSeq
    assert(rel == inl, s"relational $rel vs inline $inl")
    assert(rel.map(_.getAs[Long]("id")) == Seq(1L, 2L),
      "the null-text row must not be dropped")
    // null coalesces to '': exactly the empty-string score
    val empty = TextAnalysis.classifierScoreInline(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text",
      TextAnalysis.stubWeightArray(dim)).collect().head
    assert(rel(1).getAs[Long]("n_tokens") == empty.getAs[Long]("n_tokens"))
    assert(rel(1).getAs[Double]("score") == empty.getAs[Double]("score"))
  }

  test("committed trained fixture: dense, manifest-pinned, and it separates planted good/bad docs") {
    // integrity: every bucket present exactly once; manifest md5 matches
    // a recomputation from the fixture itself
    val w = TextAnalysis.trainedWeights(spark).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w.size == 1024 && (0 until 1024).forall(w.contains),
      "weight fixture must be dense over [0, 1024)")
    val arr = TextAnalysis.trainedWeightArray(spark)
    val manifest = spark.read.parquet(
      s"${graft.Tables.fixturesDir}/classifier_weights_manifest.parquet")
      .collect().head
    assert(manifest.getAs[String]("weights_md5") ==
      graft.tools.TrainClassifier.weightsMd5(arr),
      "manifest digest must match the committed weights")
    assert(manifest.getAs[Double]("holdout_acc") >= 0.9,
      "committed model must have recorded holdout accuracy >= 0.9")

    // behavior: clean prose over the labeled corpus's content
    // vocabulary scores positive; promo spam scores negative — note
    // BOTH planted docs are stopword-bearing, so this is a verdict the
    // learned CONTENT weights deliver, not a stopword count
    val planted = Seq(
      (1L, "the quiet river carried the golden lantern to the harbor " +
        "and the sailor watched the bright evening"),
      (2L, "buy cheap deals click here to win the free bonus offer " +
        "limited cash jackpot claim the prize now"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.classifierScoreInline(planted, "doc_id", "text", arr)
      .orderBy("id").collect()
    val good = got(0); val bad = got(1)
    assert(good.getAs[Boolean]("keep") && !bad.getAs[Boolean]("keep"),
      s"trained verdicts: good=$good bad=$bad")
    assert(good.getAs[Double]("score") > bad.getAs[Double]("score"))
  }

  test("trained model adds information: it classifies held-out docs the stopword rule gets WRONG") {
    import graft.tools.GenQualityFixtures
    // the generator is deterministic — regenerate and pin the committed
    // fixture to it through the manifest digests (drift is loud)
    val rows = GenQualityFixtures.corpus()
    val corpusMd5 = GenQualityFixtures.corpusMd5(rows)
    val labeledManifest = spark.read.parquet(
      s"${graft.Tables.fixturesDir}/labeled_quality_manifest.parquet")
      .collect().head
    assert(labeledManifest.getAs[String]("corpus_md5") == corpusMd5,
      "committed labeled corpus must match a regeneration")
    val weightsManifest = spark.read.parquet(
      s"${graft.Tables.fixturesDir}/classifier_weights_manifest.parquet")
      .collect().head
    assert(weightsManifest.getAs[String]("labels_md5") == corpusMd5,
      "committed weights must record training on exactly this corpus")
    val committed = spark.read.parquet(
      s"${graft.Tables.fixturesDir}/labeled_quality.parquet")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(committed.toSeq == rows.sortBy(_._1), "fixture rows ≡ regeneration")

    // holdout = the trainer's own split (pmod(id, 5) == 0), scored with
    // the SERVING kernel over the committed integer weights
    val holdout = rows.filter(_._1 % 5 == 0)
    val arr = TextAnalysis.trainedWeightArray(spark)
    val verdicts = TextAnalysis.classifierScoreInline(
      holdout.map(r => (r._1, r._4)).toDF("doc_id", "text"),
      "doc_id", "text", arr)
      .select("id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // the rule's verdict, via the engine's own stopwordRatio
    val rule = holdout.map(r => (r._1, r._4)).toDF("doc_id", "text")
      .select(col("doc_id"), (TextAnalysis.stopwordRatio(col("text")) >=
        graft.tools.TrainClassifier.RuleThreshold).as("rule_keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    def acc(docs: Seq[(Long, String, Int, String)],
        pred: Long => Boolean): Double =
      docs.count(d => pred(d._1) == (d._3 == 1)).toDouble / docs.size

    // the rule is uninformative on this corpus by design (~0.5) …
    val ruleAcc = acc(holdout, rule)
    assert(ruleAcc <= 0.6, s"rule holdout accuracy should be ~0.5, got $ruleAcc")
    // … the model is not —
    val modelAcc = acc(holdout, verdicts)
    assert(modelAcc >= 0.95, s"model holdout accuracy: $modelAcc")
    // — and specifically on the docs the rule MISCLASSIFIES (the
    // adversarial half: terse good text, stopword-padded spam), the
    // model still gets ≥ 95%: learned information the rule cannot have
    val ruleWrong = holdout.filter(d => rule(d._1) != (d._3 == 1))
    assert(ruleWrong.size >= 100,
      s"adversarial holdout subset must be substantial, got ${ruleWrong.size}")
    val modelOnRuleWrong = acc(ruleWrong, verdicts)
    assert(modelOnRuleWrong >= 0.95,
      s"model on rule-misclassified holdout: $modelOnRuleWrong " +
        s"(n=${ruleWrong.size}) — the added-information claim")
    // every adversarial class is represented in the demonstration
    assert(ruleWrong.map(_._2).toSet ==
      Set("g_terse", "b_stuffed", "b_repeat"),
      s"adversarial classes: ${ruleWrong.map(_._2).toSet}")
  }

  test("inline form is a valid streaming projection: stream ≡ batch per doc") {
    // Stateless scan kernel ⇒ works unchanged on an unbounded feed —
    // the classifier slots into an ingest gate with no stateful stage.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val scoredStream = TextAnalysis.classifierScoreInline(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      TextAnalysis.stubWeightArray(dim))
    val q = scoredStream.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("clf_stream").start()
    try {
      val rows = Seq(1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "spark shuffles when it must and broadcasts when it can")
      rows.foreach { r => mem.addData(r); q.processAllAvailable() }
      val streamed = spark.table("clf_stream").orderBy("id").collect().toSeq
      val batch = TextAnalysis.classifierScoreInline(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        TextAnalysis.stubWeightArray(dim)).orderBy("id").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
