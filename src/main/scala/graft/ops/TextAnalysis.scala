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
    // The not-null filters are the joins' inferred constraints, made
    // explicit so every consumer branch has the IDENTICAL subtree —
    // otherwise constraint inference pushes IsNotNull into some branches
    // only, canonical plans diverge, and exchange reuse breaks.
    val toks = df.select(col(idCol).as("_id"), col(groupCol).as("group"),
      explode(split(col(textCol), "\\s+")).as("token"))
      .filter(col("group").isNotNull && col("token").isNotNull)
    // ONE wide aggregation over the exploded relation; tf, df, and the
    // corpus doc count all derive from it, so the scan+explode+exchange
    // executes once and the three consumers reuse the shuffle stage
    // (ReusedExchange — gated in PlanQualitySpec). Previously df/tf each
    // re-derived the token relation and N was a separate driver count()
    // job: 3 corpus scans where one suffices.
    val docTf = toks.groupBy("_id", "group", "token")
      .agg(count(lit(1)).as("dtf"))
    // Every consumer must reference `dtf` in a form the optimizer can't
    // eliminate — count(dtf) gets rewritten to count(1) (dtf is
    // non-null) and then pruned from this branch, diverging the
    // canonical subtree and defeating exchange reuse. sum(dtf≥1 ? 1:0)
    // is exactly the per-token document count and keeps dtf live.
    val docFreq = docTf.groupBy("token")
      .agg(sum(when(col("dtf") >= 1, 1L).otherwise(0L)).as("df"))
    val termFreq = docTf.groupBy("group", "token").agg(sum("dtf").as("tf"))
    // N = docs contributing tokens (≡ all docs for non-null text, the
    // documents-table contract), as a 1-row broadcast — in-plan, not a
    // driver-blocking job.
    val nDocs = docTf.groupBy("_id").agg(sum(col("dtf")).as("_doc_toks"))
      .agg(count(col("_doc_toks")).as("n"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("score").desc, col("token"))
    termFreq.join(docFreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") *
        (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("group"), col("token"), col("score"), col("rk"))
  }

  /** Per-group KL divergence of the token distribution against the
    * whole-corpus distribution — the "how far does this slice drift
    * from the mix" number a data-mix report pairs with
    * [[tfIdfTopTerms]]. KL(source ‖ corpus) = Σ_t p_s(t)·ln(p_s/p_c);
    * every group token exists corpus-wide, so the ratio is always
    * defined.
    *
    * Single-pass: the per-(group, token) counts are the ONE aggregation
    * over the exploded relation; corpus counts, per-group totals, and
    * the corpus total all re-aggregate it, so the documents scan and
    * its shuffle execute once and every consumer reuses the stage
    * (ReusedExchange — gated in PlanQualitySpec). The previous shape
    * re-derived the exploded relation for each of 4 consumers including
    * a driver-blocking `count()` job — 4 corpus scans at 100 TB where
    * one suffices.
    */
  def tokenKlDivergence(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    // Explicit not-null filters keep every consumer's subtree canonically
    // identical (see tfIdfTopTerms) so the exchange is reused, not re-run.
    val toks = df.select(col(groupCol).as("group"),
      explode(split(col(textCol), "\\s+")).as("token"))
      .filter(col("group").isNotNull && col("token").isNotNull)
    val groupTf = toks.groupBy("group", "token").agg(count(lit(1)).as("gtf"))
    val corpusTf = groupTf.groupBy("token").agg(sum("gtf").as("ctf"))
    val groupN = groupTf.groupBy("group").agg(sum("gtf").as("gn"))
    val corpusN = groupN.agg(sum("gn").as("cn")) // 1 row, broadcast below
    groupTf.join(corpusTf, Seq("token"))
      .join(broadcast(groupN), Seq("group"))
      .crossJoin(broadcast(corpusN))
      .withColumn("term",
        (col("gtf") / col("gn")) *
          log((col("gtf") / col("gn")) / (col("ctf") / col("cn").cast("double"))))
      .groupBy("group")
      .agg(round(sum(col("term")), 3).as("kl"),
        count(lit(1)).as("n_distinct_tokens"))
  }

  /** Repetition-based quality signals (the Gopher/C4-style filters a
    * pretraining corpus runs before anything expensive): per document,
    *
    *   - `top_bigram_frac` — fraction of all bigram occurrences taken
    *     by the single most frequent bigram (boilerplate/template pages
    *     score high);
    *   - `dup_trigram_frac` — fraction of trigram occurrences that are
    *     repeats of an earlier trigram in the same document (looping /
    *     stuttering generators score high);
    *   - `keep` — the composite gate: ≥ `minTokens` tokens, mean token
    *     length in a natural band, and both repetition signals under
    *     their thresholds.
    *
    * Per-document signals need no cross-document state, so this is a
    * SHUFFLE-FREE projection: the codegen'd
    * [[graft.functions.RepetitionStatsExpr]] computes all four gram
    * counters in one byte scan per row (an explode → groupBy
    * formulation materializes ~L gram rows per document and shuffles
    * them twice — measured 17× slower at sf0.1). Plan-gated to one
    * FileScan and zero hash exchanges in CorpusOpsSpec.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, maxTopBigramFrac: Double = 0.06,
      maxDupTrigramFrac: Double = 0.02): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol).as("doc_id"),
        tokenStats(t).as("_ts"),
        repetitionExpr(t).as("_rs"))
      .select(col("doc_id"),
        col("_ts").getField("n_tokens").as("n_tokens"),
        round(ratio(col("_ts").getField("total_token_chars"),
          col("_ts").getField("n_tokens")), 4).as("mean_token_len"),
        topBigramFrac(col("_rs")).as("top_bigram_frac"),
        dupTrigramFrac(col("_rs")).as("dup_trigram_frac"))
      .withColumn("keep",
        col("n_tokens") >= minTokens &&
          col("mean_token_len").between(2.0, 12.0) &&
          col("top_bigram_frac") <= maxTopBigramFrac &&
          col("dup_trigram_frac") <= maxDupTrigramFrac)
  }

  /** The composite repetition/length gate as ONE boolean column — the
    * filter-stage form of [[repetitionStats]] for composing into batch
    * or streaming pipelines (`docs.filter(repetitionKeep(col("text")))`
    * before the stateful stages). Same rounded arithmetic and
    * thresholds as the report's `keep` column, via the shared helpers,
    * so the two forms cannot drift. */
  def repetitionKeep(text: Column, minTokens: Int = 20,
      maxTopBigramFrac: Double = 0.06,
      maxDupTrigramFrac: Double = 0.02): Column = {
    val ts = tokenStats(text)
    val rs = repetitionExpr(text)
    val nTokens = ts.getField("n_tokens")
    val meanLen = round(ratio(ts.getField("total_token_chars"), nTokens), 4)
    nTokens >= minTokens &&
      meanLen.between(2.0, 12.0) &&
      topBigramFrac(rs) <= maxTopBigramFrac &&
      dupTrigramFrac(rs) <= maxDupTrigramFrac
  }

  private def repetitionExpr(text: Column): Column =
    bridge.column(graft.functions.RepetitionStatsExpr(bridge.expression(text)))

  private def topBigramFrac(rs: Column): Column =
    round(when(rs.getField("n_bigrams") > 0,
      rs.getField("top_bigrams").cast("double") / rs.getField("n_bigrams"))
      .otherwise(lit(0.0)), 4)

  private def dupTrigramFrac(rs: Column): Column =
    round(when(rs.getField("n_trigrams") > 0,
      (rs.getField("n_trigrams") - rs.getField("distinct_trigrams"))
        .cast("double") / rs.getField("n_trigrams"))
      .otherwise(lit(0.0)), 4)

  /** PII patterns, valid under BOTH Java regex (Spark) and RE2-style
    * engines — no backreferences, no lookaround — so an external system
    * auditing the scrub reproduces it exactly. */
  val piiEmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpv4Pattern: String = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val piiLongNumberPattern: String = "\\d{9,}"

  /** Scrub emails, IPv4 addresses, and ≥9-digit number runs (ids,
    * phone-ish strings) to typed placeholders — the redaction pass a
    * training corpus runs before anything leaves the raw zone. Order
    * matters and is fixed: emails first (they contain dots + digits),
    * then IPv4 (dot-separated short digit runs, untouched by the email
    * pass), then long digit runs (≥9, so IPv4 octets never match).
    * Three codegen'd `regexp_replace` passes — scan speed, no UDF.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmailPattern, "<EMAIL>"),
        piiIpv4Pattern, "<IP>"),
      piiLongNumberPattern, "<NUM>")

  /** struct(n_email, n_ip, n_num) — per-document redaction counts on
    * the ORIGINAL text (the audit row a scrub job emits next to the
    * cleaned column). Patterns are mutually non-overlapping on counts:
    * emails carry no 9-digit runs or dotted quads, IPv4 octets are ≤3
    * digits. */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(piiEmailPattern)).as("n_email"),
    regexp_count(text, lit(piiIpv4Pattern)).as("n_ip"),
    regexp_count(text, lit(piiLongNumberPattern)).as("n_num"))

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

  /** Deterministic placeholder weights for [[classifierScore]]: one
    * signed integer weight per hash bucket (Knuth multiplicative mix →
    * uniform-ish in [-500, 500)). This is the STUB half of the
    * classifier — production replaces it with trained weights read
    * from parquet; the operator only ever sees a (bucket, iw)
    * relation, so swapping models is a data change, not a code
    * change. */
  def hashedStubWeights(spark: org.apache.spark.sql.SparkSession,
      dim: Int = 1024): DataFrame =
    spark.range(dim).select(col("id").cast("int").as("bucket"),
      ((col("id") * 2654435761L) % 1000 - 500).as("iw"))

  /** fastText-style hashed linear quality classifier: tokens hash into
    * `dim` buckets (engine-portable md5 hash — the oracle replays it),
    * each bucket carries a signed INTEGER weight from the broadcast
    * `weights` relation, and a document's score is the mean bucket
    * weight. Integer accumulation makes the score exact and
    * summation-order-free (the q_anomaly discipline): engines can
    * disagree on double-sum order, never on a long sum. `keep` is the
    * binary quality verdict (positive mass).
    *
    * Scale: the only wide exchange is the per-doc groupBy; the weight
    * table (even a 2^20-bucket production model) is a few MB —
    * broadcast, never shuffled. Tokens never leave their scan
    * partition before being reduced to (id, bucket).
    */
  def classifierScore(df: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int = 1024): DataFrame = {
    // Null text is coalesced to '' (scored as one empty token) so the
    // relational and inline forms agree UNCONDITIONALLY — explode over a
    // null split would silently drop the row here while the inline kernel
    // kept it, breaking the pinned parity on null-bearing corpora.
    val toks = df.select(col(idCol).as("id"),
        explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("tok"))
      .select(col("id"),
        (Dedup.md5TokenHash60(col("tok")) % dim).cast("int").as("bucket"))
    toks.join(broadcast(weights), Seq("bucket"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("iw")).as("raw"))
      // score = one IEEE division of two exactly-representable integers
      // — bit-identical across engines. NO closing decimal round: a
      // quotient landing exactly on a 6th-decimal tie (raw·1000/n ≡ ½)
      // rounds differently through a double's shortest-repr HALF_UP vs
      // DuckDB's float rounding, which is how the retrained weights
      // broke parity on 2 docs; the unrounded quotient cannot disagree.
      .select(col("id"), col("n_tokens"),
        (col("raw") / (col("n_tokens") * 1000.0)).as("score"),
        (col("raw") > 0).as("keep"))
  }

  /** The stub weight table of [[hashedStubWeights]] as a plain array —
    * the weights-as-reference-object form [[classifierScoreInline]]
    * consumes. Same formula, same bucket indexing. */
  def stubWeightArray(dim: Int = 1024): Array[Long] =
    Array.tabulate(dim)(b => (b.toLong * 2654435761L) % 1000 - 500)

  /** The TRAINED weight relation — the committed
    * `fixtures/classifier_weights.parquet` produced by
    * [[graft.tools.TrainClassifier]] (logistic regression over hashed
    * token buckets; labels are ground truth by construction of the
    * committed labeled corpus, [[graft.tools.GenQualityFixtures]],
    * half of which is adversarial to the stopword rule — provenance,
    * holdout accuracy, and the model-beats-the-rule audit numbers in
    * the sibling manifest).
    * Dense: every bucket in [0, dim) has a row, so inner-join scoring
    * and the inline array form agree exactly. Path resolves through
    * `SPARK_GRAFT_FIXTURES_DIR` like every fixture. */
  def trainedWeights(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(s"${graft.Tables.fixturesDir}/classifier_weights.parquet")

  /** [[trainedWeights]] collapsed to the dense array the zero-shuffle
    * kernel carries (dim longs — trivially collectable; at a 2²⁰-bucket
    * production dim, keep the relation form and broadcast-join). */
  def trainedWeightArray(spark: org.apache.spark.sql.SparkSession,
      dim: Int = 1024): Array[Long] = {
    val arr = new Array[Long](dim)
    trainedWeights(spark).collect().foreach { r =>
      arr(r.getInt(0)) = r.getLong(1)
    }
    arr
  }

  /** ZERO-shuffle formulation of [[classifierScore]]: the whole
    * classifier collapses into one codegen'd scan-side kernel
    * ([[graft.functions.HashedScoreExpr]] over the split token array,
    * weights carried as data on the expression) — no explode, no
    * join, no per-doc exchange, so scoring 100 TB is embarrassingly
    * parallel at scan speed. Identical output to the relational
    * variant for non-null text (ClassifierSpec pins parity); prefer
    * this form until the weight table outgrows the per-stage task
    * binary (~10⁶ buckets), then switch to the broadcast relation.
    */
  def classifierScoreInline(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Long]): DataFrame = {
    // coalesce mirrors [[classifierScore]]: null text scores as one empty
    // token in BOTH forms, keeping inline ≡ relational unconditional.
    val s = graft.functions.functions.hashed_score(
      split(coalesce(col(textCol), lit("")), "\\s+"), weights)
    df.select(col(idCol).as("id"), s.as("_s"))
      .select(col("id"),
        col("_s").getField("n_tokens").as("n_tokens"),
        // unrounded for the same cross-engine reason as the relational
        // form: integer/integer IEEE division is bit-exact everywhere
        (col("_s").getField("raw") /
          (col("_s").getField("n_tokens") * 1000.0)).as("score"),
        (col("_s").getField("raw") > 0).as("keep"))
  }

  /** Calibration table of the trained classifier against ground truth —
    * the audit a pipeline runs before TRUSTING the keep-probability for
    * thresholding or mix weighting (a 96%-accurate model can still be
    * badly calibrated, and then "keep if P ≥ 0.9" means nothing). Each
    * document's serving score maps through the logistic link to a
    * confidence; equal-width confidence bins report observed positive
    * rate vs mean stated confidence — the reliability diagram's data,
    * from ONE scan + one bounded-grid aggregation (expected calibration
    * error is Σ over bins of (n_b/N)·|frac_pos − avg_conf|, a pure
    * finishing fold the spec computes). Scores are bit-exact integer
    * ratios; the sigmoid and the bin floor are single IEEE expressions
    * on identical operands (boundary landings measure-zero, the
    * established convention). */
  def classifierCalibration(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, weights: Array[Long], bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val scored = classifierScoreInline(docs, idCol, textCol, weights)
    scored
      .join(docs.select(col(idCol).as("id"), col(labelCol).as("label")), Seq("id"))
      .withColumn("conf", lit(1.0) / (lit(1.0) + exp(-col("score"))))
      .withColumn("bin",
        least(floor(col("conf") * lit(bins.toDouble)), lit((bins - 1).toDouble))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("conf")), 4).as("avg_conf"),
        round(avg(col("label").cast("double")), 4).as("frac_pos"))
      .orderBy(col("bin"))
  }

  /** The temperature grid for [[fitTemperature]]: T = i/40 for
    * i ∈ [10, 128] — 0.25 … 3.20 in 0.025 steps, T = 1 (i = 40)
    * included BY CONSTRUCTION so the fitted NLL can never exceed the
    * uncalibrated one. Each T is one IEEE division of exact integers —
    * bit-identical across engines, no rounding convention needed. */
  def temperatureGrid(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(10, 129).select((col("id").cast("double") / lit(40.0)).as("t"))

  /** Per-temperature negative log-likelihood of the logistic link over a
    * (score, label) relation — the sufficient statistic a TEMPERATURE
    * SCALING fit minimizes (Guo et al., ICML 2017: recalibrate a
    * trained classifier by a single scalar T on the logit, the step a
    * pipeline takes when the [[classifierCalibration]] table shows
    * miscalibration; accuracy is untouched since T preserves ranking).
    *
    * Shape for 100 TB: ONE data-sized aggregation quantizes scores to a
    * 4-dp HISTOGRAM (score, label, cnt) — the [[Drift]] binning
    * discipline, bounded by the score range — and the grid evaluation
    * is histogram × 119 temperatures, a bounded cross product. The
    * argmin is `orderBy().limit(1)` (TakeOrdered — no global window).
    * Deterministic: z is quantized 4 dp BEFORE the race via the
    * engine-portable floor(10⁴·z + ½)/10⁴ chain — `round()` is
    * half-up on each engine's DECIMAL rendering and diverges at exact
    * 4th-decimal ties, which the integer-ratio scores HIT (raw/(n·1000)
    * lands on .xxxx5 whenever 2·n·10³ divides 10⁴·raw; observed on 8
    * fixture docs) — whereas the floor chain is one IEEE expression on
    * identical operands. Every NLL term is likewise a pure IEEE chain;
    * per-T sums round 6 dp; grid ties break toward smaller T. */
  /** The 4-dp (score, label) histogram both calibration fits evaluate
    * over — the one data-sized aggregation; see [[temperatureNll]] for
    * the floor-chain quantizer rationale. */
  private def scoreHistogram(scoredLabeled: DataFrame): DataFrame =
    scoredLabeled
      .select((floor(col("score") * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("z"),
        col("label").cast("double").as("y"))
      .groupBy("z", "y").agg(count(lit(1)).as("cnt"))

  /** Sigmoid output clamped to [ε, 1−ε] BEFORE the logs: once |logit|
    * ≳ 37 a double sigmoid saturates to exactly 0.0/1.0 — Spark's
    * `log` then returns NULL and the term silently DROPS from the NLL
    * sum (a silent fit bias that also breaks the fitted ≤ raw
    * invariant), while the DuckDB oracle's ln(0) errors. The clamp is
    * the identical single expression on both engines, an identity for
    * every non-saturated score. */
  private val NllEps = 1e-15
  private def clamped(p: org.apache.spark.sql.Column) =
    greatest(least(p, lit(1.0 - NllEps)), lit(NllEps))

  def temperatureNll(scoredLabeled: DataFrame): DataFrame = {
    val p = clamped(lit(1.0) / (lit(1.0) + exp(-(col("z") / col("t")))))
    scoreHistogram(scoredLabeled)
      .crossJoin(broadcast(temperatureGrid(scoredLabeled.sparkSession)))
      .select(col("t"), (col("cnt") *
        -(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p)))
        .as("term"))
      .groupBy("t").agg(round(sum("term"), 6).as("nll"))
  }

  /** The fitted temperature: grid argmin of [[temperatureNll]].
    * One row (t, nll). */
  def fitTemperature(scoredLabeled: DataFrame): DataFrame =
    temperatureNll(scoredLabeled).orderBy(col("nll"), col("t")).limit(1)

  /** PLATT-SCALING NLL surface (Platt 1999 — the two-parameter sigmoid
    * recalibration σ(A·z + B), the generalization of temperature
    * scaling that can also fix a calibration OFFSET, not just the
    * slope): the same bounded 4-dp histogram crossed with a 119 × 41
    * (A, B) grid — A = i/40 ∈ [0.25, 4.0] (contains 1, and spans the full
    * reciprocal range of the temperature grid so the slope the T fit
    * can reach, the Platt fit can too), B = j/10 ∈ [−2, 2] (contains
    * 0), so the identity sits on the grid and the fitted NLL can
    * never exceed the raw one. Grid cells × histogram
    * rows is a bounded cross product (the [[temperatureNll]] shape,
    * one more broadcast factor); ties break toward (smaller A,
    * smaller B). */
  def plattNll(scoredLabeled: DataFrame): DataFrame = {
    val spark = scoredLabeled.sparkSession
    val aGrid = spark.range(10, 161)
      .select((col("id").cast("double") / lit(40.0)).as("a"))
    val bGrid = spark.range(-20, 21)
      .select((col("id").cast("double") / lit(10.0)).as("b"))
    val p = clamped(
      lit(1.0) / (lit(1.0) + exp(-(col("a") * col("z") + col("b")))))
    scoreHistogram(scoredLabeled)
      .crossJoin(broadcast(aGrid)).crossJoin(broadcast(bGrid))
      .select(col("a"), col("b"), (col("cnt") *
        -(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p)))
        .as("term"))
      .groupBy("a", "b").agg(round(sum("term"), 6).as("nll"))
  }

  /** The fitted Platt parameters: grid argmin of [[plattNll]].
    * One row (a, b, nll). */
  def fitPlatt(scoredLabeled: DataFrame): DataFrame =
    plattNll(scoredLabeled).orderBy(col("nll"), col("a"), col("b")).limit(1)

  /** [[classifierCalibration]] under a FITTED temperature: fit T on the
    * (score, label) relation, then bin confidences σ(score/T) — the
    * re-audit that closes the calibration loop (fit, then SHOW the
    * reliability table improved). The scored relation is evaluated once
    * per branch (fit histogram + table binning — labeled slices are
    * audit-sized by construction; at production scale the scored
    * relation is materialized at ingest like every feature store). */
  def classifierCalibrationFitted(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, weights: Array[Long],
      bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val scored = classifierScoreInline(docs, idCol, textCol, weights)
      .join(docs.select(col(idCol).as("id"), col(labelCol).as("label")), Seq("id"))
    val tRow = fitTemperature(scored).select(col("t"))
    scored.crossJoin(broadcast(tRow))
      .withColumn("conf", lit(1.0) / (lit(1.0) + exp(-(col("score") / col("t")))))
      .withColumn("bin",
        least(floor(col("conf") * lit(bins.toDouble)), lit((bins - 1).toDouble))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("conf")), 4).as("avg_conf"),
        round(avg(col("label").cast("double")), 4).as("frac_pos"))
      .orderBy(col("bin"))
  }

  /** [[classifierCalibration]] under the FITTED Platt parameters —
    * [[classifierCalibrationFitted]]'s two-parameter twin: fit (A, B)
    * on the (score, label) relation, then bin confidences σ(A·score+B).
    * Completes the fit→audit symmetry: both calibration families now
    * publish the corrected reliability table, not just the fitted
    * scalars. Same shape budget (one histogram fit + one audit-sized
    * binning; the (a, b) row broadcasts like the temperature scalar). */
  def classifierCalibrationPlattFitted(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, weights: Array[Long],
      bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val scored = classifierScoreInline(docs, idCol, textCol, weights)
      .join(docs.select(col(idCol).as("id"), col(labelCol).as("label")), Seq("id"))
    val abRow = fitPlatt(scored).select(col("a"), col("b"))
    scored.crossJoin(broadcast(abRow))
      .withColumn("conf", lit(1.0) /
        (lit(1.0) + exp(-(col("a") * col("score") + col("b")))))
      .withColumn("bin",
        least(floor(col("conf") * lit(bins.toDouble)), lit((bins - 1).toDouble))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("conf")), 4).as("avg_conf"),
        round(avg(col("label").cast("double")), 4).as("frac_pos"))
      .orderBy(col("bin"))
  }

  /** ISOTONIC-REGRESSION calibration fit (Zadrozny & Elkan, KDD 2002 —
    * the NON-parametric family next to temperature and Platt: fit the
    * best monotone non-decreasing map score → P(positive), no sigmoid
    * assumption, the correction of choice when the reliability curve
    * is monotone but not sigmoid-shaped). Returns the fitted step
    * function as (z, yhat) rows over the 4-dp score histogram's
    * distinct quantized scores.
    *
    * Shape for 100 TB: ONE data-sized aggregation produces the bounded
    * (z, Σy, n) histogram (the same [[Drift]]-binning stance as both
    * parametric fits); pool-adjacent-violators then runs on the
    * COLLECTED histogram — O(bins) driver work on a model-sized
    * relation, the centroid/SQ-bounds convention. Pool comparisons are
    * exact (BigInt cross-multiplication of integer label sums and
    * counts), each fitted value is ONE IEEE division of exact integer
    * sums, quantized by the engine-portable floor chain.
    *
    * Cross-engine determinism: the DuckDB oracle replays the fit with
    * the MINIMAX identity ŷ_i = max_{j≤i} min_{k≥i} avg(y[j..k]) over
    * the same histogram — the classical closed form of isotonic
    * regression. Equality is exact in IEEE: every candidate average is
    * a correctly-rounded division of exact integer sums, division is
    * monotone, so the rounded max-min equals the rounded pooled block
    * average PAV computes. */
  def fitIsotonic(scoredLabeled: DataFrame): Seq[(Double, Double)] = {
    val hist = scoreHistogram(scoredLabeled)
      .groupBy("z").agg(sum(col("y") * col("cnt")).as("sy"),
        sum(col("cnt")).as("w"))
      .orderBy("z")
      .collect()
      .map(r => (r.getDouble(0), BigInt(r.getDouble(1).toLong),
        BigInt(r.getLong(2))))
    require(hist.nonEmpty, "isotonic fit needs a nonempty (score, label) relation")
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(BigInt, BigInt, List[Double])]
    hist.foreach { case (z, sy, w) =>
      var cur = (sy, w, List(z))
      // pool while the previous block's average ≥ the current's
      // (violates monotone non-decreasing) — exact rational compare
      while (blocks.nonEmpty &&
          blocks.last._1 * cur._2 >= cur._1 * blocks.last._2) {
        val p = blocks.remove(blocks.length - 1)
        cur = (p._1 + cur._1, p._2 + cur._2, p._3 ::: cur._3)
      }
      blocks += cur
    }
    blocks.iterator.flatMap { case (sy, w, zs) =>
      val yhat = math.floor(sy.toDouble / w.toDouble * 1e6 + 0.5) / 1e6
      zs.map(z => (z, yhat))
    }.toSeq
  }

  /** [[classifierCalibration]] under the fitted ISOTONIC map — the
    * non-parametric member of the fit→audit family: each document's
    * quantized score looks up its pooled positive rate (the fitted
    * step function broadcasts — bounded by the histogram), and the
    * reliability table bins those calibrated confidences. */
  def classifierCalibrationIsotonic(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, weights: Array[Long],
      bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = classifierScoreInline(docs, idCol, textCol, weights)
      .join(docs.select(col(idCol).as("id"), col(labelCol).as("label")), Seq("id"))
    val fitDf = fitIsotonic(scored).toDF("z", "conf")
    scored
      .withColumn("z",
        floor(col("score") * lit(10000.0) + lit(0.5)) / lit(10000.0))
      .join(broadcast(fitDf), Seq("z"))
      .withColumn("bin",
        least(floor(col("conf") * lit(bins.toDouble)), lit((bins - 1).toDouble))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("conf")), 4).as("avg_conf"),
        round(avg(col("label").cast("double")), 4).as("frac_pos"))
      .orderBy(col("bin"))
  }

  /** Expected calibration error of a [[classifierCalibration]]-shaped
    * table: Σ_b (n_b/N)·|frac_pos − avg_conf| over the (already
    * 4-dp-rounded) bin means — one finishing fold over ≤ bins rows,
    * rounded 6 dp. */
  def calibrationEce(table: DataFrame): DataFrame =
    table.agg(round(
      sum(col("n_docs").cast("double") * abs(col("frac_pos") - col("avg_conf"))) /
        sum(col("n_docs")), 6).as("ece"))
}
