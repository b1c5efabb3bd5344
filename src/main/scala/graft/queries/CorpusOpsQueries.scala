package graft.queries

import graft.Tables
import graft.ops.{Curation, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Fourth wave of the query surface (round 8): the corpus-operations
  * family a pretraining-data build runs around the dedup/ANN core —
  * repetition-based quality gating (Gopher/C4-style), benchmark
  * decontamination, PII scrubbing, token-budget shard packing, and
  * temperature-based mix planning. Same oracle conventions as
  * [[QueryCatalog]]: identical column aliases both sides, total ORDER
  * BY, doubles rounded, integer sums CAST to BIGINT in DuckDB.
  */
object CorpusOpsQueries {
  import QueryCatalog.Q

  /** Gopher-style repetition/quality report
    * ([[TextAnalysis.repetitionStats]]): top-bigram fraction,
    * duplicate-trigram fraction, and the composite keep gate.
    * Thresholds are corpus-calibrated so the gate is load-bearing
    * (top_bigram_frac ≤ 0.06 sits at ~p85 of the fixture corpus;
    * n_tokens ≥ 20 cuts the short tail). Shuffle-free: one codegen'd
    * byte scan per row, plan-gated in CorpusOpsSpec. */
  val textGopherQuality: Q = (s, dir) =>
    TextAnalysis.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  val textGopherQualitySql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
      |base AS (
      |  SELECT doc_id, len(tk) AS n_tokens,
      |    round(CASE WHEN len(tk) > 0
      |      THEN CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / len(tk)
      |      ELSE 0.0 END, 4) AS mean_token_len,
      |    list_concat(
      |      list_transform(range(1, len(tk)),
      |        i -> '2 ' || tk[i] || ' ' || tk[i+1]),
      |      list_transform(range(1, len(tk) - 1),
      |        i -> '3 ' || tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS kgs
      |  FROM t),
      |ex AS (
      |  SELECT doc_id, n_tokens, mean_token_len, unnest(kgs) AS kg FROM base),
      |c AS (
      |  SELECT doc_id, n_tokens, mean_token_len, kg, count(*) AS c
      |  FROM ex GROUP BY ALL),
      |p AS (
      |  SELECT doc_id, n_tokens, mean_token_len,
      |    max(CASE WHEN kg LIKE '2 %' THEN c END) AS top2,
      |    sum(CASE WHEN kg LIKE '2 %' THEN c END) AS tot2,
      |    sum(CASE WHEN kg LIKE '3 %' THEN c END) AS tot3,
      |    count(CASE WHEN kg LIKE '3 %' THEN 1 END) AS dist3
      |  FROM c GROUP BY doc_id, n_tokens, mean_token_len),
      |f AS (
      |  SELECT doc_id, n_tokens, mean_token_len,
      |    round(coalesce(CAST(top2 AS DOUBLE) / tot2, 0.0), 4) AS top_bigram_frac,
      |    round(coalesce(CAST(tot3 - dist3 AS DOUBLE) / tot3, 0.0), 4) AS dup_trigram_frac
      |  FROM p)
      |SELECT doc_id, n_tokens, mean_token_len, top_bigram_frac, dup_trigram_frac,
      |  (n_tokens >= 20 AND mean_token_len BETWEEN 2.0 AND 12.0
      |   AND top_bigram_frac <= 0.06 AND dup_trigram_frac <= 0.02) AS keep
      |FROM f ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination ([[Curation.decontaminate]]): the eval
    * set is every 97th document, the corpus is the rest; any corpus doc
    * sharing a word trigram with the eval set is dropped. n=3 is
    * calibrated to the fixture's 10–99-token documents (the 8–13-gram
    * production default would never fire on texts this short); at
    * sf0.01 the filter removes ~35% of the corpus — load-bearing, not
    * decorative. The hash-join implementation equals the oracle's
    * string-equality join modulo 64-bit collisions (~10⁻⁷ at sf1). */
  val textDecontaminate: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    Curation.decontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  val textDecontaminateSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |         ELSE list_transform(range(1, len(tk) - 1),
      |                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END AS tri
      |  FROM t),
      |sh AS (SELECT doc_id, unnest(tri) AS s FROM g),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
      |contaminated AS (
      |  SELECT DISTINCT doc_id FROM sh
      |  WHERE doc_id % 97 <> 0 AND s IN (SELECT s FROM bench))
      |SELECT d.doc_id, d.source FROM documents d
      |WHERE d.doc_id % 97 <> 0
      |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
      |ORDER BY d.doc_id""".stripMargin

  /** PII scrub ([[TextAnalysis.scrubPii]]): the fixture corpus carries
    * no PII by construction, so the query SYNTHESIZES a deterministic
    * contact suffix from table data (email on every 3rd doc, IPv4 on
    * every 2nd, a 10-digit reference id on all) and gates the redacted
    * text plus per-kind counts. The scrub itself is three codegen'd
    * regexp passes whose patterns are Java-regex/RE2 portable — DuckDB
    * replays the identical redaction. */
  val textPiiScrub: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    val raw = concat(
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(col("doc_id") % 2 === 0,
        concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
          lit(".0."), (col("doc_id") % 250).cast("string"))).otherwise(lit("")),
      concat(lit(" ref "), (col("doc_id") + 1100000000L).cast("string")))
    d.select(col("doc_id"), raw.as("_raw"))
      .select(col("doc_id"),
        TextAnalysis.scrubPii(col("_raw")).as("scrubbed"),
        TextAnalysis.piiCounts(col("_raw")).as("_pc"))
      .select(col("doc_id"), col("scrubbed"),
        col("_pc").getField("n_email").as("n_email"),
        col("_pc").getField("n_ip").as("n_ip"),
        col("_pc").getField("n_num").as("n_num"))
      .orderBy(col("doc_id"))
  }

  val textPiiScrubSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    text
      |    || CASE WHEN doc_id % 3 = 0
      |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |         ELSE '' END
      |    || CASE WHEN doc_id % 2 = 0
      |         THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
      |           || '.0.' || CAST(doc_id % 250 AS VARCHAR)
      |         ELSE '' END
      |    || ' ref ' || CAST(doc_id + 1100000000 AS VARCHAR) AS r
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g'),
      |    '\d{9,}', '<NUM>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
      |  CAST(len(regexp_extract_all(r, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS INTEGER) AS n_ip,
      |  CAST(len(regexp_extract_all(r, '\d{9,}')) AS INTEGER) AS n_num
      |FROM raw ORDER BY doc_id""".stripMargin

  /** Token-budget shard packing ([[Sampling.packShards]]): documents
    * pack into ~2000-token shards per source (greedy streaming, no doc
    * split); the query emits the per-shard manifest summary. Budget
    * 2000 yields multiple shards per source from sf0.01 up. */
  val qPackShards: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    Sampling.packShards(d, "doc_id", "source", "n_tokens",
        budgetTokens = 2000L)
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
      .orderBy(col("source"), col("shard"))
  }

  val qPackShardsSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    len(string_split_regex(text, '\s+')) AS n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT source, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM d)
      |SELECT source, CAST(floor(prior / 2000.0) AS BIGINT) AS shard,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
      |FROM p GROUP BY source, shard
      |ORDER BY source, shard""".stripMargin

  /** Temperature mix plan ([[Sampling.temperatureMix]]): per-LANGUAGE
    * targets for a 250-doc budget at tau = 0.5 (sqrt flattening —
    * IEEE-exact, so cross-engine deterministic where pow would not be).
    * Grouping is by `lang` because the fixture's language distribution
    * is skewed (en ≈ 40%) where sources are uniform — the flattening
    * is load-bearing: en's natural ~39% share plans to ~29%. Budget
    * 250 keeps every rate strictly below 1 at all SFs (n ∝ SF but
    * target ∝ sqrt(n)/z is SF-invariant, so rates only shrink as data
    * grows). */
  val qMixTemperature: Q = (s, dir) =>
    Sampling.temperatureMix(Tables.documents(s, dir), "lang",
        budget = 250L)
      .orderBy(col("group"))

  val qMixTemperatureSql: String =
    """WITH c AS (
      |  SELECT lang AS "group", count(*) AS n_docs
      |  FROM documents GROUP BY lang),
      |z AS (SELECT sum(sqrt(n_docs)) AS z FROM c),
      |m AS (
      |  SELECT "group", n_docs,
      |    round(sqrt(n_docs) / z, 4) AS weight,
      |    CAST(floor(250.0 * sqrt(n_docs) / z + 0.5) AS BIGINT) AS target
      |  FROM c, z)
      |SELECT "group", n_docs, weight, target,
      |  round(least(1.0, CAST(target AS DOUBLE) / n_docs), 4) AS rate
      |FROM m ORDER BY "group"""".stripMargin

  /** Plan → execute composition ([[Sampling.temperatureMix]] →
    * [[Sampling.applyMixPlan]]): compute per-language rates from corpus
    * counts, then deterministically sample with them in the same job —
    * the full "build the mix" dataflow, hash-gated row-for-row (DuckDB
    * recomputes both the rates and the md5-60 membership uniform).
    * Budget 250 (see [[qMixTemperature]]) keeps every rate < 1, so the
    * sample is a strict, language-rebalanced subset at all SFs. */
  val qMixApply: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val plan = Sampling.temperatureMix(docs, "lang", budget = 250L)
    Sampling.applyMixPlan(docs, "doc_id", "lang", plan, seed = "mixT")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val qMixApplySql: String = {
    val hexVal = (0 until 15).map(i =>
      s"(strpos('0123456789abcdef', substring(h15, ${i + 1}, 1)) - 1) * ${1L << (4 * (14 - i))}")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |z AS (SELECT sum(sqrt(n_docs)) AS z FROM c),
       |plan AS (
       |  SELECT lang, n_docs,
       |    CAST(floor(250.0 * sqrt(n_docs) / z + 0.5) AS BIGINT) AS target
       |  FROM c, z),
       |rates AS (
       |  SELECT lang,
       |    round(least(1.0, CAST(target AS DOUBLE) / n_docs), 4) AS rate
       |  FROM plan),
       |hashed AS (
       |  SELECT doc_id, lang,
       |    substring(md5('mixT' || CAST(doc_id AS VARCHAR)), 1, 15) AS h15
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, lang,
       |    CAST($hexVal AS DOUBLE) / 1152921504606846976.0 AS unif
       |  FROM hashed)
       |SELECT u.doc_id, u.lang FROM u JOIN rates USING (lang)
       |WHERE u.unif < rates.rate
       |ORDER BY u.doc_id""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "text_gopher_quality" -> textGopherQuality,
    "text_decontaminate" -> textDecontaminate,
    "text_pii_scrub" -> textPiiScrub,
    "q_pack_shards" -> qPackShards,
    "q_mix_temperature" -> qMixTemperature,
    "q_mix_apply" -> qMixApply)

  val oracles: Map[String, String] = Map(
    "text_gopher_quality" -> textGopherQualitySql,
    "text_decontaminate" -> textDecontaminateSql,
    "text_pii_scrub" -> textPiiScrubSql,
    "q_pack_shards" -> qPackShardsSql,
    "q_mix_temperature" -> qMixTemperatureSql,
    "q_mix_apply" -> qMixApplySql)
}
