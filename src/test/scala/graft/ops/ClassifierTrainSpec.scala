package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Classifier trainer ([[ClassifierTrain]]): the distributed logistic
  * fit separates a separable corpus, the quantized integer weights
  * reproduce the trained decision through the SERVING kernel, and the
  * per-epoch plan keeps the weight relation broadcast. */
class ClassifierTrainSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 256

  /** Synthetic separable corpus: "good" docs are stopword-rich, "bad"
    * docs stopword-free, over the real operator vocabulary. */
  private def corpus: Seq[(Long, String, Double)] = {
    val content = IndexedSeq("batch", "merge", "sort", "join", "scan",
      "window", "filter", "hash", "query", "column")
    val stops = IndexedSeq("the", "a", "of", "to")
    (1L to 200L).map { id =>
      val rnd = new scala.util.Random(id)
      val good = id % 2 == 0
      val toks = (1 to 40).map { _ =>
        if (good && rnd.nextDouble() < 0.35) stops(rnd.nextInt(stops.size))
        else if (!good && rnd.nextDouble() < 0.02) stops(rnd.nextInt(stops.size))
        else content(rnd.nextInt(content.size))
      }
      (id, toks.mkString(" "), if (good) 1.0 else 0.0)
    }
  }

  test("fit separates planted good/bad docs; holdout accuracy >= 0.9") {
    val docs = corpus.toDF("doc_id", "text", "y")
    val feats = ClassifierTrain.features(docs, "doc_id", "text", dim)
    val labels = docs.select(col("doc_id").as("id"), col("y"))
    val train = labels.filter(pmod(col("id"), lit(5)) =!= 0)
    val hold = labels.filter(pmod(col("id"), lit(5)) === 0)
    val w = ClassifierTrain.fit(spark,
      feats.join(train.select("id"), Seq("id")), train, dim,
      epochs = 60, lr = 60.0)
    val acc = ClassifierTrain.accuracy(spark,
      feats.join(hold.select("id"), Seq("id")), hold, w)
    assert(acc >= 0.9, s"holdout accuracy $acc")

    // quantized integer weights drive the SERVING kernel to the same
    // verdicts: keep == (mean bucket weight > 0) == trained decision
    val iw = ClassifierTrain.quantize(w)
    val served = TextAnalysis.classifierScoreInline(docs, "doc_id", "text", iw)
      .select(col("id"), col("keep"))
    val agree = served.join(labels, Seq("id"))
      .select((col("keep") === (col("y") === 1.0)).cast("long").as("ok"))
      .agg(avg("ok")).collect().head.getDouble(0)
    assert(agree >= 0.9, s"serving-kernel agreement $agree")
  }

  test("features: one row per (doc, bucket), n is the doc token count; null text = one empty token") {
    val docs = Seq((1L, "the the a"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val f = ClassifierTrain.features(docs, "doc_id", "text", dim).collect()
    val d1 = f.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[Long]("cnt")).sum == 3L)
    assert(d1.forall(_.getAs[Long]("n") == 3L))
    assert(d1.length == 2, "two distinct buckets: 'the' and 'a'")
    val d2 = f.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getAs[Long]("n") == 1L,
      "null text must contribute one empty-token row, not vanish")
  }

  test("accuracy over an EMPTY audit slice is NaN, not an avg(NULL) NPE") {
    // an arbitrary labeled-corpus path can produce an empty holdout or
    // an empty rule-wrong residue — the trainer must record "nothing to
    // measure", not crash (round-13 ADVICE, TrainClassifier.scala:75)
    val docs = corpus.toDF("doc_id", "text", "y")
    val feats = ClassifierTrain.features(docs, "doc_id", "text", dim)
    val empty = docs.filter(lit(false))
      .select(col("doc_id").as("id"), col("y"))
    val acc = ClassifierTrain.accuracy(spark, feats, empty, new Array[Double](dim))
    assert(acc.isNaN, s"expected NaN on an empty slice, got $acc")
  }

  test("training epoch keeps the weight relation broadcast") {
    val docs = corpus.take(20).toDF("doc_id", "text", "y")
    val feats = ClassifierTrain.features(docs, "doc_id", "text", dim)
    val wDf = spark.createDataFrame(
      (0 until dim).map(b => (b, 0.1))).toDF("bucket", "w")
    val plan = feats.join(broadcast(wDf), Seq("bucket"))
      .groupBy("id").agg(sum(col("w") * col("cnt") / col("n")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast, not shuffle:\n$plan")
  }
}
