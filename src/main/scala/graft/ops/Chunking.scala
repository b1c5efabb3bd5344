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
