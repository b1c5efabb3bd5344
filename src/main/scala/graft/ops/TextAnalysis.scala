package graft.ops

import graft.functions.functions.rolling_hash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * pure column expressions (whole-stage codegen'd, no UDFs in the hot
  * path) so they run at scan speed over 100 TB of documents.
  */
object TextAnalysis {

  /** Whitespace tokenizer (single-space corpora split exactly; runs of
    * whitespace collapse). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + punctuation marks counted
    * separately (a cheap, deterministic proxy for tokenizer load). */
  def subwordCountEstimate(text: Column): Column =
    size(split(text, "[\\s]+")) +
      length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}]", ""))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that")

  /** Fraction of tokens that are stopwords — exact rational, computed as
    * codegen'd higher-order functions (no shuffle, no UDF). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite document quality score in [0,1]: favors mid-length docs,
    * low punctuation noise, and a natural stopword rate — the standard
    * cheap pre-filter before expensive dedup/embedding stages.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore * 0.4 + punctPenalty * 0.3 + stopScore * 0.3), 4)
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Intentionally small: language ID at corpus scale must be
    * a scan-speed expression; a real model goes behind the same API.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de"),
    "fr" -> Seq("le", "la", "les", "est", "et", "que", "dans", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Language-ID heuristic: score = marker-token hits per language, pick
    * the argmax ("und" = undetermined when nothing matches). Implemented
    * as a fold over literal marker arrays — fully codegen'd.
    */
  def langId(text: Column): Column = {
    val toks = transform(tokens(text), t => lower(t))
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers.map(_.asInstanceOf[Any]): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit rolling-hash document fingerprint (codegen'd custom
    * expression, [[graft.functions.RollingHashExpr]]). */
  def fingerprint(text: Column): Column = rolling_hash(text)

  /** Full per-document text-stats projection. */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("mean_token_len", round(meanTokenLen(t), 4))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
