package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Leakage-safe split: clusters never straddle splits (the guarantee),
  * a naive per-doc split demonstrably WOULD leak on the same corpus,
  * and the fractions converge on singleton-dominated data. */
class SplitSpec extends SparkSpec {
  import spark.implicits._

  /** 30 near-dup pairs (one token changed) + unrelated singletons. */
  private def corpus: Seq[(Long, String)] = {
    val pairs = (0 until 30).flatMap { i =>
      val base = s"document number $i discusses topic alpha$i beta$i " +
        s"gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i kappa$i"
      Seq((i * 2L, base), (i * 2L + 1, base.replace("discusses", "covers")))
    }
    val singles = (0 until 40).map(i =>
      (1000L + i, s"unrelated standalone text about subject$i with " +
        s"words aa$i bb$i cc$i dd$i ee$i ff$i gg$i hh$i"))
    pairs ++ singles
  }

  test("no near-dup component ever straddles splits; a per-doc split would") {
    val df = corpus.toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(df, "doc_id", "text",
      trainFrac = 0.6, valFrac = 0.2)
    val rows = out.select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect()
    // the guarantee: one split per component
    val splitsPerComp = rows.groupBy(_._2).map(_._2.map(_._3).toSet.size)
    assert(splitsPerComp.forall(_ == 1), "a component straddled splits")
    // the planted pairs really are clustered (the guarantee is load-bearing)
    val pairComps = rows.filter(_._1 < 1000L).groupBy(_._2)
    assert(pairComps.exists(_._2.length >= 2), "planted near-dups must cluster")
    // the naive per-DOC split separates at least one planted pair on
    // this very corpus — the leakage this operator exists to prevent
    val naiveSplit = df.select(col("doc_id"),
        when(Sampling.hashUniform(col("doc_id"), "split") < 0.6, "train")
          .when(Sampling.hashUniform(col("doc_id"), "split") < 0.8, "val")
          .otherwise("test").as("split"))
      .as[(Long, String)].collect().toMap
    val leaked = (0 until 30).count(i =>
      naiveSplit(i * 2L) != naiveSplit(i * 2L + 1))
    info(s"naive per-doc split separates $leaked of 30 near-dup pairs")
    assert(leaked > 0, "corpus must demonstrate the naive-split leakage")
  }

  test("fractions converge on singleton-dominated data") {
    val singles = (0 until 500).map(i =>
      (i.toLong, s"standalone text $i with tokens x$i y$i z$i w$i v$i u$i t$i s$i"))
    val out = Sampling.leakageSafeSplit(singles.toDF("doc_id", "text"),
      "doc_id", "text", trainFrac = 0.8, valFrac = 0.1)
    val frac = out.groupBy("split").count().as[(String, Long)].collect().toMap
      .map { case (k, v) => k -> v.toDouble / 500 }
    info(s"fractions: $frac")
    assert(math.abs(frac("train") - 0.8) < 0.06, s"train: ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.05)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.05)
  }

  test("deterministic across partitionings") {
    val df = corpus.toDF("doc_id", "text")
    val a = Sampling.leakageSafeSplit(df.repartition(7), "doc_id", "text", 0.7, 0.15)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val b = Sampling.leakageSafeSplit(df.coalesce(1), "doc_id", "text", 0.7, 0.15)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(a == b)
  }
}
