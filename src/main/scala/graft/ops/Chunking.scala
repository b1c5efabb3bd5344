package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document's token stream into
  * fixed-size windows with a configurable stride (overlap = `size −
  * stride` tokens when `stride < size`; a sampling gap when `stride >
  * size`) — the standard preparation step between a curated corpus and
  * sequence packing ([[graft.queries.CorpusOpsQueries]]'s `q_pack_*`
  * operate on whole docs; training pipelines chunk first so no example
  * exceeds the model context).
  *
  * Scale shape: chunking is embarrassingly parallel — one narrow,
  * whole-stage-codegen'd projection per document (split → explode of
  * the start sequence → slice), NO shuffle anywhere in the operator
  * (ChunkingSpec gates zero Exchange). Output amplification is
  * `≈ size/stride` rows per document; emitting the portable 60-bit
  * chunk hash instead of the chunk text keeps the output relation
  * narrow for downstream joins (dedup across chunks, pack manifests)
  * while `tok_start`/`n_tokens` keep every chunk reconstructible from
  * the source doc.
  *
  * Window-start contract (mirrored exactly by the `text_chunk`
  * oracle): starts are multiples of `stride` in
  * `[0, min(n−1, max(n − size + stride − 1, 0))]` — i.e. step by
  * `stride` but (a) never start at/past the end, and (b) drop trailing
  * windows whose tokens are entirely contained in the previous window
  * (for `stride < size` a naive `start < n` rule emits a final window
  * that adds no new tokens whenever `start − stride + size ≥ n`).
  * Every token belongs to ≥1 chunk when `stride ≤ size`; the tail
  * chunk may be shorter than `size`.
  */
object Chunking {

  /** Whitespace tokens, empties dropped — lockstep with the oracle's
    * `string_split_regex(text, '\s+')` replay (the [[TextIndex]]
    * convention). */
  private def tokens(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => t =!= "")

  /** Cross-document repeated-span removal (C4/RefinedWeb-style
    * boilerplate scrub): split each doc into DISJOINT `span`-token
    * windows, count each distinct span's cross-doc document frequency,
    * drop spans appearing in more than `maxDf` docs, and rebuild the
    * scrubbed token stream from the kept windows. Near-duplicate and
    * templated documents share exact spans (headers, footers, license
    * blocks); span-level df is the classic signal that removes the
    * shared boilerplate while keeping each doc's unique content.
    *
    * Output: `(id, n_spans, n_kept, n_tokens_clean, clean_hash)` with
    * `clean_hash` the md5-60 of the space-rejoined scrubbed stream
    * (narrow artifact; reconstruction coordinates live in [[chunk]]).
    *
    * Scale shape: span df is one aggregation keyed by the 8-byte span
    * hash (count-distinct-doc under it — the exchange carries (hash,
    * id) pairs, linear in corpus spans); the verdict joins back to the
    * span relation and reduces to a per-doc kept-index LIST, so the
    * only shuffled payloads are hashes and integer indices. The
    * rebuild then RE-SCANS the base table (column-pruned to id+text)
    * and re-slices locally — two cheap scans instead of shuttling the
    * corpus text through two exchanges, the right trade at 100 TB
    * where scan bandwidth is plentiful and shuffle is the bottleneck.
    * The per-doc re-slice is a HOF lambda (interpreted, not codegen) —
    * bounded by kept-span count per doc, far off the hot path.
    */
  def scrubRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      span: Int, maxDf: Long = 1L): DataFrame = {
    require(span > 0, "span must be positive")
    val spans = chunk(docs, idCol, textCol, size = span, stride = span)
    val dfRel = spans.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("id")).as("df"))
    val perDoc = spans.join(dfRel, Seq("chunk_hash"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops nulls, so the when() keeps only surviving
        // window indices; sort restores document order.
        sort_array(collect_list(when(col("df") <= maxDf, col("chunk_idx"))))
          .as("kept"))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .join(perDoc, Seq("id"))
      .withColumn("ct", flatten(transform(col("kept"),
        i => slice(col("ts"), (i * span + 1).cast("int"), lit(span)))))
      .select(col("id"), col("n_spans"), col("n_kept"),
        org.apache.spark.sql.functions.size(col("ct")).as("n_tokens_clean"),
        Dedup.md5TokenHash60(array_join(col("ct"), " ")).as("clean_hash"))
  }

  /** ALIGNMENT-FREE exact repeated-substring scrub — Lee et al.
    * (ACL'22, "Deduplicating Training Data Makes Language Models
    * Better") semantics: remove every token that lies inside a
    * verbatim repeat of ≥ `minLen` tokens occurring more than
    * `maxOcc` times ANYWHERE in the corpus (across documents or
    * within one), at ANY token offset. [[scrubRepeatedSpans]] hashes
    * DISJOINT windows, so a repeated passage that straddles a window
    * boundary — the common case for boilerplate behind
    * variable-length prefixes — escapes it unless the two occurrences
    * happen to share grid alignment (ChunkingSpec plants exactly that
    * miss). This operator is offset-free and EXACT both ways, by one
    * observation: a repeat of length ≥ L contains, and is exactly
    * tiled by, repeated L-grams at EVERY start inside it — so
    * fingerprinting ALL n−L+1 sliding L-grams per document and
    * occurrence-counting them marks precisely the tokens Lee et al.'s
    * suffix array would (a token is in some repeat ≥ L ⇔ some L-gram
    * containing it repeats; modulo only md5-60 collisions, the
    * corpus-wide hashing convention).
    *
    * Output: `(id, n_tokens, n_repeated, n_tokens_clean, clean_hash)`
    * — `n_repeated` the count of repeated gram STARTS in the doc,
    * `clean_hash` the md5-60 of the space-rejoined scrubbed stream.
    *
    * Scale shape: the sliding-gram relation is n rows per n-token
    * document — stride-1 where [[scrubRepeatedSpans]] strides L, i.e.
    * L× more hashing compute (md5 over ~L tokens per position) but
    * the SAME exchange payload shape: the occurrence count groups by
    * the 8-byte gram hash with map-side partial aggregation, and only
    * hashes + integer starts ever shuffle, never text. The repeated
    * relation is pre-filtered to `occ > maxOcc` BEFORE the join back,
    * so the second exchange carries repeated grams only (in a clean
    * corpus, ~nothing). The rebuild re-scans the base table and
    * re-slices locally — the [[scrubRepeatedSpans]] two-scan trade.
    * Coverage union per doc is one sorted-starts interval merge
    * (HOF, linear in repeated starts per doc except for the
    * append-copies-accumulator cost, quadratic only in the number of
    * DISJOINT repeated regions — bounded by n/L in theory, a handful
    * in practice). No suffix array is materialized: Lee et al. sort
    * suffixes to find the repeats; at cluster scale the hash-group
    * does the same discovery as one shuffle, the form Spark executes
    * well. */
  def scrubRepeatedSubstrings(docs: DataFrame, idCol: String,
      textCol: String, minLen: Int, maxOcc: Long = 1L): DataFrame = {
    require(minLen > 0, "minLen must be positive")
    val L = minLen
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("ts")))
      .filter(col("n") > 0)
    // every sliding L-gram start (docs shorter than L have no grams
    // and cannot participate in a repeat ≥ L)
    val grams = base.filter(col("n") >= L)
      .select(col("id"),
        explode(sequence(lit(0), col("n") - L)).as("s"),
        col("ts"))
      .select(col("id"), col("s"),
        Dedup.md5TokenHash60(
          array_join(slice(col("ts"), col("s") + 1, lit(L)), " ")).as("gh"))
    val repeatedGrams = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > maxOcc)
    // per doc: the sorted repeated starts (empty for untouched docs)
    val repStarts = grams.join(repeatedGrams, Seq("gh"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("s"))).as("starts"))
    val emptyIv = array().cast("array<struct<lo:int,hi:int>>")
    base.join(repStarts, Seq("id"), "left")
      .withColumn("starts", coalesce(col("starts"), array().cast("array<int>")))
      // merge [s, s+L) intervals: starts are sorted and all intervals
      // share length L, so a later start always ends later — the merged
      // hi is simply s + L, no max needed
      .withColumn("cov", aggregate(col("starts"), emptyIv, (acc, s) => {
        val last = element_at(acc, -1)
        val merged = concat(
          slice(acc, lit(1), org.apache.spark.sql.functions.size(acc) - 1),
          array(struct(last.getField("lo").as("lo"), (s + L).cast("int").as("hi"))))
        val appended = concat(acc,
          array(struct(s.cast("int").as("lo"), (s + L).cast("int").as("hi"))))
        when(org.apache.spark.sql.functions.size(acc) > 0 &&
          s <= last.getField("hi"), merged).otherwise(appended)
      }))
      // gap i of m+1: [prev hi (or 0), next lo (or n)) — the kept runs
      .withColumn("keptIv", filter(
        transform(
          sequence(lit(0), org.apache.spark.sql.functions.size(col("cov"))),
          i => struct(
            when(i === 0, lit(0))
              .otherwise(element_at(col("cov"), i).getField("hi")).as("lo"),
            when(i === org.apache.spark.sql.functions.size(col("cov")), col("n"))
              .otherwise(element_at(col("cov"), i + 1).getField("lo")).as("hi"))),
        g => g.getField("hi") > g.getField("lo")))
      .withColumn("ct", flatten(transform(col("keptIv"),
        g => slice(col("ts"), g.getField("lo") + 1,
          g.getField("hi") - g.getField("lo")))))
      .select(col("id"), col("n").as("n_tokens"),
        org.apache.spark.sql.functions.size(col("starts")).cast("long").as("n_repeated"),
        org.apache.spark.sql.functions.size(col("ct")).as("n_tokens_clean"),
        Dedup.md5TokenHash60(array_join(col("ct"), " ")).as("clean_hash"))
  }

  /** One row per (doc, window): `(id, chunk_idx, tok_start, n_tokens,
    * chunk_hash)` with `chunk_hash` the engine-portable md5-60 of the
    * space-rejoined window ([[Dedup.md5TokenHash60]]). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("ts")))
      .filter(col("n") > 0)
      .withColumn("st", explode(sequence(lit(0),
        least(col("n") - 1, greatest(col("n") - (size - stride) - 1, lit(0))),
        lit(stride))))
      .select(col("id"), (col("st") / stride).cast("long").as("chunk_idx"),
        col("st").as("tok_start"),
        slice(col("ts"), col("st") + 1, lit(size)).as("chunk"))
      .select(col("id"), col("chunk_idx"), col("tok_start"),
        org.apache.spark.sql.functions.size(col("chunk")).as("n_tokens"),
        Dedup.md5TokenHash60(array_join(col("chunk"), " ")).as("chunk_hash"))
  }
}
