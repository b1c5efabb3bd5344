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
