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

  // MessageDigest is stateful and not thread-safe; one instance per
  // executor thread instead of one allocation per row (this runs inside
  // the keyed dedup's per-row key extraction).
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5hex(s: String): String = {
    val d = md5.get()
    d.reset()
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

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

  /** The streaming analog of [[graft.ops.Curation.report]]: tumbling
    * event-time windows over a CURATED document stream, per (window,
    * lang, source) — watermark-bounded state, append-mode emission when
    * each window closes.
    *
    * Runs as its OWN query over the curated sink, not fused onto
    * [[curate]]: Spark's stateful-correctness check rejects a windowed
    * aggregation chained after `flatMapGroupsWithState` in one query
    * (the dedup may emit rows the downstream watermark already passed),
    * and it is right to — the supported composition is
    * `curate → durable sink → readStream → report`, which is also the
    * operational shape a 100 TB pipeline wants (the curated corpus IS
    * the product; reports are cheap derived queries over it). */
  def report(curated: Dataset[CuratedDoc], windowLength: String,
      delay: String): DataFrame =
    curated.toDF()
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLength), col("lang_pred"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        round(avg(col("quality")), 2).as("avg_quality"))
}
