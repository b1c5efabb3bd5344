package graft.ops

import graft.functions.{LangIdExpr, TokenStatsExpr}
import graft.functions.functions.rolling_hash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * The per-token statistics (`tokenCount`/`meanTokenLen`/
  * `stopwordRatio`/`langId`) are backed by the codegen'd
  * [[graft.functions.TokenStatsExpr]]/[[graft.functions.LangIdExpr]]
  * byte-scan expressions — Spark's higher-order-function lambdas are
  * interpreted per element, which is exactly the profile that dominates
  * a quality pass over 100 TB of documents (TextAnalysisSpec pins the
  * fast path ≡ the declarative HOF formulation). The character-level
  * ratios are plain builtins (regexp engines, codegen'd); nothing here
  * is a UDF, so the whole stats projection runs at scan speed.
  */
object TextAnalysis {

  /** Whitespace tokenizer (single-space corpora split exactly; runs of
    * whitespace collapse). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** struct(n_tokens, total_token_chars, stopword_hits) in one
    * codegen'd pass over the UTF-8 bytes. */
  def tokenStats(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    bridge.column(TokenStatsExpr(bridge.expression(text), stopwords))

  def tokenCount(text: Column): Column = tokenStats(text).getField("n_tokens")

  /** BPE-ish subword count estimate: words + punctuation marks counted
    * separately (a cheap, deterministic proxy for tokenizer load). */
  def subwordCountEstimate(text: Column): Column =
    tokenCount(text) +
      length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}]", ""))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that")

  /** Fraction of tokens that are stopwords (exact token match). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val ts = tokenStats(text, stopwords)
    ratio(ts.getField("stopword_hits"), ts.getField("n_tokens"))
  }

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokenStats(text)
    ratio(ts.getField("total_token_chars"), ts.getField("n_tokens"))
  }

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

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

  /** Language-ID heuristic: lowercase tokens scored against per-language
    * marker sets, argmax by (hits, lang) — "und" when nothing matches.
    * One codegen'd byte scan ([[graft.functions.LangIdExpr]]); an
    * honest placeholder for a real model behind the same API.
    */
  def langId(text: Column): Column =
    bridge.column(LangIdExpr(bridge.expression(text)))

  /** 64-bit rolling-hash document fingerprint (codegen'd custom
    * expression, [[graft.functions.RollingHashExpr]]). */
  def fingerprint(text: Column): Column = rolling_hash(text)

  /** TF-IDF top terms per group (e.g. per source): the standard
    * "what characterizes this slice of the corpus" analysis a mix
    * report runs next to [[stats]].
    *
    * tf = raw token count within the group; idf = ln((N+1)/(df+1)) + 1
    * (smoothed, N = total docs, df = docs containing the token);
    * score = tf × idf, top-`k` terms per group by (score, token).
    * All plain DataFrame aggregations — explode → two groupBys + a
    * window — so map-side partial aggregation and AQE apply; nothing
    * is collected. At 100 TB the token→df relation is the big
    * intermediate; it shuffles once, keyed by token.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("_id"), col(groupCol).as("group"),
      explode(split(col(textCol), "\\s+")).as("token"))
    val n = df.count()
    val docFreq = toks.select(col("_id"), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val termFreq = toks.groupBy("group", "token").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("score").desc, col("token"))
    termFreq.join(docFreq, Seq("token"))
      .withColumn("score", round(col("tf") *
        (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("group"), col("token"), col("score"), col("rk"))
  }

  /** Per-group KL divergence of the token distribution against the
    * whole-corpus distribution — the "how far does this slice drift
    * from the mix" number a data-mix report pairs with
    * [[tfIdfTopTerms]]. KL(source ‖ corpus) = Σ_t p_s(t)·ln(p_s/p_c);
    * every group token exists corpus-wide, so the ratio is always
    * defined. Two token-keyed aggregations and a broadcast-size join
    * of per-group totals — the corpus-wide token relation shuffles
    * once; nothing reaches the driver.
    */
  def tokenKlDivergence(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("group"),
      explode(split(col(textCol), "\\s+")).as("token"))
    val corpusTf = toks.groupBy("token").agg(count(lit(1)).as("ctf"))
    val corpusN = toks.count()
    val groupTf = toks.groupBy("group", "token").agg(count(lit(1)).as("gtf"))
    val groupN = toks.groupBy("group").agg(count(lit(1)).as("gn"))
    groupTf.join(corpusTf, Seq("token"))
      .join(broadcast(groupN), Seq("group"))
      .withColumn("term",
        (col("gtf") / col("gn")) *
          log((col("gtf") / col("gn")) / (col("ctf") / lit(corpusN.toDouble))))
      .groupBy("group")
      .agg(round(sum(col("term")), 3).as("kl"),
        count(lit(1)).as("n_distinct_tokens"))
  }

  /** Full per-document text-stats projection. The token statistics are
    * computed once per row (single `_ts` struct, shared by the derived
    * columns) — one byte scan + two regex passes per document.
    */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val ts = col("_ts")
    df.withColumn("_ts", tokenStats(t))
      .withColumn("n_tokens", ts.getField("n_tokens"))
      .withColumn("mean_token_len",
        round(ratio(ts.getField("total_token_chars"), ts.getField("n_tokens")), 4))
      .withColumn("stopword_ratio",
        round(ratio(ts.getField("stopword_hits"), ts.getField("n_tokens")), 4))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("quality", round(
        least(length(t).cast("double") / lit(500.0), lit(1.0)) * 0.4 +
          greatest(lit(0.0), lit(1.0) - punctRatio(t) * 5.0) * 0.3 +
          least(ratio(ts.getField("stopword_hits"), ts.getField("n_tokens")) * 4.0,
            lit(1.0)) * 0.3, 4))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
      .drop("_ts")
  }
}
