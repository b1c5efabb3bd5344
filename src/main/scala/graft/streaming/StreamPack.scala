package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Sampling.packShards]]: assign arriving
  * documents to token-budget training shards as they stream in, one
  * running token counter per group — the manifest builder a continuous
  * ingestion pipeline runs where the batch job runs `packShards` over a
  * finished corpus.
  *
  * Semantics: greedy streaming packing in ARRIVAL order (micro-batch
  * order; within a micro-batch, `doc_id` order) —
  * `shard = floor(tokens-before-this-doc / budget)`, oversized
  * documents overflow their shard, nothing splits. When documents
  * arrive in `doc_id` order the assignment is byte-identical to the
  * batch `packShards` manifest (pinned in StreamPackSpec); under
  * reordering it is a different-but-valid greedy packing — the
  * sequential-manifest semantics cannot be order-free, which is why
  * the batch twin exists for reproducible re-packs.
  *
  * State: ONE long per group (`flatMapGroupsWithState`, no timeout —
  * groups are bounded vocabularies like source/dump/date-bucket, and a
  * pack counter must survive idle gaps by definition; callers that key
  * by an unbounded column should bucket it first). Shards parallelize
  * across groups exactly like the batch window.
  */
object StreamPack {

  final case class PackDoc(doc_id: Long, group: String, n_tokens: Long)
  final case class PackedDoc(doc_id: Long, group: String, n_tokens: Long,
    shard: Long)
  final case class PackState(priorTokens: Long)

  def packByGroup(ds: Dataset[PackDoc], budgetTokens: Long): Dataset[PackedDoc] = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(ds.isStreaming,
      "packByGroup is a streaming operator; use Sampling.packShards in batch")
    implicit val stateEnc = Encoders.product[PackState]
    implicit val outEnc = Encoders.product[PackedDoc]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.group)
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          var prior = if (state.exists) state.get.priorTokens else 0L
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val shard = prior / budgetTokens
            prior += d.n_tokens
            PackedDoc(d.doc_id, d.group, d.n_tokens, shard)
          }
          state.update(PackState(prior))
          out.iterator
      }
  }
}
