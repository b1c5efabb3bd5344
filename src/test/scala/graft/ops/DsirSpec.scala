package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val model =
    Dsir.train(docs, "doc_id", "text", col("lang") === "en", buckets = 512)
  private lazy val weights =
    Dsir.logWeights(docs, "doc_id", "text", model).persist()

  test("model is bucket-bounded and smoothing leaves no bucket unscoreable") {
    val ratios = model.ratios.collect()
    assert(ratios.length <= 512, "model larger than the bucket space")
    assert(ratios.forall(!_.isNullAt(ratios.head.fieldIndex("llr"))),
      "a bucket got a null llr — smoothing failed")
    assert(model.rawTotal >= model.targetTotal && model.targetTotal > 0)
  }

  test("target-domain documents score higher than off-domain ones") {
    val byLang = weights
      .join(docs.select("doc_id", "lang"), weights("id") === docs("doc_id"))
      .groupBy("lang").agg(avg("logw").as("m"))
      .as[(String, Double)].collect().toMap
    val others = byLang.filterNot(_._1 == "en").values
    assert(others.nonEmpty)
    assert(others.forall(byLang("en") > _),
      s"en mean ${byLang("en")} not above every non-target mean: $byLang")
  }

  test("every scoreable document is present with a finite weight") {
    val scoreable = docs.filter(col("text").isNotNull &&
      size(split(col("text"), "\\s+")) > 1).count()
    assert(weights.count() == scoreable)
    assert(weights.filter(col("logw").isNull || isnan(col("logw"))).count() == 0)
  }

  test("resampling selects the target-like docs far above base rate, deterministically") {
    val sel = Dsir.resample(weights, n = 50, seed = "dsirSpec")
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
    val enSel = sel.filter(col("lang") === "en").count().toDouble / 50
    val enBase = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    assert(enSel > enBase + 0.2,
      s"selected en fraction $enSel not materially above base $enBase")
    val again = Dsir.resample(weights, n = 50, seed = "dsirSpec")
      .select("id").as[Long].collect().toSet
    assert(again == sel.select("id").as[Long].collect().toSet, "same seed ⇒ same sample")
    val other = Dsir.resample(weights, n = 50, seed = "other")
      .select("id").as[Long].collect().toSet
    assert(other != again, "different seed should move the Gumbel race")
  }

  test("the on-disk feature store reproduces the inline path row for row") {
    val path = graft.Staging.dirFor("dsir-feats-spec")
    Dsir.writeFeatures(docs, "doc_id", "text", 512, path)
    val feats = Dsir.readFeatures(spark, path)
    val tIds = docs.filter(col("lang") === "en")
      .select(col("doc_id").as("id")).distinct()
    val stored = Dsir.trainFeatures(feats, tIds, buckets = 512)
    assert(stored.targetTotal == model.targetTotal &&
      stored.rawTotal == model.rawTotal)
    val a = Dsir.logWeightsFeatures(feats, stored)
      .orderBy("id").collect().toSeq
    val b = weights.orderBy("id").collect().toSeq
    assert(a == b, "store-path weights diverge from the inline explode")
  }

  test("the model is DENSE: a new document's unseen bucket gets the smoothed llr, not a drop") {
    assert(model.ratios.count() == 512,
      "ratios must cover every bucket, observed or not")
    // the pure-smoothing llr every unobserved bucket must carry
    val expected = math.log(1.0 / (model.targetTotal + 512.0)) -
      math.log(1.0 / (model.rawTotal + 512.0))
    val unobserved = model.ratios.filter(col("rc") === 0)
      .select("llr").as[Double].collect()
    assert(unobserved.nonEmpty, "fixture should leave some buckets unobserved")
    assert(unobserved.forall(l => math.abs(l - expected) < 1e-12))
    // scoring a doc whose bigrams the training pool never saw: every
    // feature lands (n_feats counts all of them) instead of dropping
    val novel = Seq((999999L, "zzqq1 zzqq2 zzqq3")).toDF("doc_id", "text")
    val w = Dsir.logWeights(novel, "doc_id", "text", model).collect()
    assert(w.length == 1 && w.head.getLong(1) == 2,
      s"both novel bigrams must be scored: ${w.toSeq}")
  }

  test("plan: the model side broadcasts into the scoring join") {
    val df = Dsir.logWeights(docs, "doc_id", "text", model)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastQueryStage"),
      s"model join not broadcast:\n$plan")
  }
}
