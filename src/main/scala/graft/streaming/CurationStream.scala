package graft.streaming

import graft.ops.Curation
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of the batch curation pipeline
  * ([[graft.ops.Curation]]): the stage structure is identical —
  * score → filter → dedup — but re-expressed for a continuous corpus
  * feed (a crawl ingest, a CDC stream of document upserts):
  *
  *   - scoring and filtering are STATELESS projections over each
  *     micro-batch, running the same codegen'd byte-scan expressions
  *     as batch ([[graft.ops.TextAnalysis]]) — nothing to re-derive;
  *   - exact dedup becomes the STATEFUL [[StreamDedup.dedupByKey]]
  *     keyed by the text digest: keep-FIRST-ARRIVAL (the streaming
  *     analog of batch keep-lowest-id — arrival order is the only
  *     total order a stream has), replays suppressed while the key's
  *     event-time TTL lives, state bounded by the watermark horizon;
  *   - the per-source rollup is downstream's choice (watermarked
  *     windowed agg or batch over the curated sink) — this operator
  *     emits the curated document stream itself, which is the reusable
  *     surface.
  *
  * At 100 TB/day the digest-keyed state is the scale knob: state holds
  * one (digest → timestamp) entry per curated doc inside the TTL
  * horizon, independent of raw input volume, because filtering runs
  * BEFORE the stateful stage — same stage-order argument as batch.
  */
object CurationStream {

  /** One curated document as emitted by [[curate]]. */
  final case class CuratedDoc(doc_id: Long, source: String, text: String,
    ts: java.sql.Timestamp, lang_pred: String, n_tokens: Long, quality: Double)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Curate a streaming document feed. Input columns: doc_id (long),
    * source (string), text (string), `eventTimeCol` (timestamp).
    *
    * @param delay watermark delay for late documents
    * @param ttlMs how long a text digest suppresses replays
    */
  def curate(docs: DataFrame, minQuality: Double, eventTimeCol: String,
      delay: String, ttlMs: Long): Dataset[CuratedDoc] = {
    require(docs.isStreaming, "CurationStream.curate is a streaming operator; " +
      "use graft.ops.Curation.curate in batch")
    import docs.sparkSession.implicits._
    val scored = Curation.score(docs, "text")
      .filter(col("lang_pred") =!= "und" && col("quality") >= minQuality)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("text"), col(eventTimeCol).as("ts"), col("lang_pred"),
        col("n_tokens").cast("long").as("n_tokens"), col("quality"))
      .as[CuratedDoc]
    StreamDedup.dedupByKey[CuratedDoc](scored,
      key = d => md5hex(d.text),
      eventTimeMs = _.ts.getTime, eventTimeCol = "ts",
      delay = delay, ttlMs = ttlMs)
  }
}
