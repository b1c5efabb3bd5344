package graft.tools

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.Tables
import graft.ops.{ClassifierTrain, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off trainer for the committed quality-classifier weights behind
  * `text_quality_classifier` and pipeline v3's fused gate — the
  * [[GenMediaFixtures]] pattern applied to a model: train once, commit
  * the weights as a single-file parquet fixture plus a write-time
  * manifest recording how they were made and how well they did, so the
  * oracle (and any auditor) replays the scoring against the exact
  * committed relation.
  *
  * Labels derive from the repo's OWN quality signals over the sf0.01
  * corpus: y = 1 iff the document's stopword density reaches the
  * quality score's 25%-of-cap point (`stopword_ratio ≥ 0.0625`, i.e.
  * `min(4·ratio, 1) ≥ 0.25` — see [[TextAnalysis.stats]]). Stopword
  * density is deliberately the ONLY label component: it is the
  * token-distribution part of the composite quality signal, which is
  * exactly what a length-normalized bag-of-words model can express —
  * document length and punctuation density are invisible to mean
  * bucket weights and remain separate gates (the Gopher split:
  * distributional quality as a learned scorer, structural quality as
  * rule gates).
  *
  * Run once, outputs committed:
  * `sbt "runMain graft.tools.TrainClassifier"`.
  */
object TrainClassifier {

  val Dim = 1024
  val LabelThreshold = 0.0625

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "fixtures"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val labels = docs.select(col("doc_id").as("id"),
        (TextAnalysis.stopwordRatio(col("text")) >= LabelThreshold)
          .cast("double").as("y"))
      val feats = ClassifierTrain.features(docs, "doc_id", "text", Dim)
      // deterministic 80/20 split keyed on the id itself
      val trainIds = labels.filter(pmod(col("id"), lit(5)) =!= 0)
      val holdIds = labels.filter(pmod(col("id"), lit(5)) === 0)
      val w = ClassifierTrain.fit(spark, feats.join(trainIds.select("id"), Seq("id")),
        trainIds, Dim, epochs = 300, lr = 80.0)
      val trainAcc = ClassifierTrain.accuracy(spark,
        feats.join(trainIds.select("id"), Seq("id")), trainIds, w)
      val holdAcc = ClassifierTrain.accuracy(spark,
        feats.join(holdIds.select("id"), Seq("id")), holdIds, w)
      val iw = ClassifierTrain.quantize(w)
      val posFrac = labels.agg(avg("y")).collect().head.getDouble(0)

      // dense (bucket, iw) relation — every bucket present so an inner
      // join is a left join and the inline array form agrees exactly
      import spark.implicits._
      val weightsDf = iw.toIndexedSeq.zipWithIndex
        .map { case (v, b) => (b, v) }.toDF("bucket", "iw")
        .select(col("bucket").cast("int"), col("iw").cast("long"))
      writeSingleFile(spark, weightsDf.coalesce(1).orderBy("bucket"),
        s"$outDir/classifier_weights.parquet")
      val md5 = weightsMd5(iw)
      val manifest = Seq((Dim, LabelThreshold, posFrac,
        trainIds.count(), holdIds.count(), trainAcc, holdAcc, md5, sfDir))
        .toDF("dim", "label_threshold", "pos_frac", "n_train", "n_holdout",
          "train_acc", "holdout_acc", "weights_md5", "trained_on")
      writeSingleFile(spark, manifest.coalesce(1),
        s"$outDir/classifier_weights_manifest.parquet")
      println(f"trained dim=$Dim pos_frac=$posFrac%.3f " +
        f"train_acc=$trainAcc%.4f holdout_acc=$holdAcc%.4f md5=$md5")
    } finally spark.stop()
  }

  /** Canonical digest of the quantized weights: md5 over
    * "bucket:iw\n" lines in bucket order — recomputable from the
    * fixture by anyone (ClassifierSpec re-derives it). */
  def weightsMd5(iw: Array[Long]): String = {
    val s = iw.zipWithIndex.map { case (v, b) => s"$b:$v" }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  private def writeSingleFile(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("clf-weights").toString
    // coalesce HERE (idempotent if the caller already did) so the
    // exactly-one-part assumption is enforced, not remembered
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val parts = new File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length == 1,
      s"expected exactly one part file in $tmp, found ${parts.length}")
    new File(dest).getParentFile.mkdirs()
    Files.move(parts.head.toPath, Paths.get(dest),
      StandardCopyOption.REPLACE_EXISTING)
    // drop the temp dir (remaining _SUCCESS/CRC files) — leaving one
    // behind per invocation litters the tmpdir
    new File(tmp).listFiles().foreach(_.delete())
    Files.delete(Paths.get(tmp))
  }
}
