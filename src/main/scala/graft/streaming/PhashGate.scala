package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IMAGE ingestion gate — [[SimhashGate]]'s multimodal twin,
  * and the shape an image/caption crawl actually needs at the door:
  * reject an arriving image whose 64-bit perceptual signature
  * ([[graft.functions.ImagePhash]] aHash, computed from BYTES in the
  * batch scan) sits within Hamming `maxDist` of any already-accepted
  * image. The byte-copy, the JPEG re-encode, and the one-pixel edit —
  * the three mirror-site arrival classes the fixtures plant — all land
  * within the Manku-lossless radius, so what this gate accepts is
  * exactly what the batch probe ([[graft.ops.Multimodal
  * .newVsCorpusPhash]]) would accept. Per micro-batch:
  *
  *   1. decode + sign IN the batch scan (image bytes never shuffle —
  *      only (id, sig) enters any exchange; an UNDECODABLE blob has no
  *      signature, can match nothing, and always passes — the gate
  *      family's unsigned-doc convention, image edition: garbage is
  *      data for a downstream relational filter, not a gate error);
  *   2. in-batch collapse: among arrivals within `maxDist` of each
  *      other, the smallest id survives;
  *   3. survivors probe the accumulated block store (this epoch's own
  *      partition excluded — replay idempotence);
  *   4. accepted images append to the corpus sink AND their block rows
  *      to the store in the GATE family's flat per-epoch layout
  *      (`batch=<id>` with `b` as a data column — [[SimhashGate]]'s,
  *      NOT the serving store's nested `b=` tree): the generic epoch
  *      sweeps apply in their flat form —
  *      `Retraction.retract(indexDir, "id", ids)` and
  *      `Compaction.compactEpochs(indexDir, h)` with no
  *      `nestedPartCols` (mixing forms corrupts partition discovery).
  *      The on-disk SERVING index remains
  *      [[graft.ops.Multimodal.appendPhashIndexEpoch]].
  */
object PhashGate {

  /** Gate ONE batch of (id, content) rows. Returns accepted count. */
  def gateBatch(batch: DataFrame, batchId: Long, indexDir: String,
      acceptedDir: String, idCol: String, contentCol: String,
      blocks: Int = 4, maxDist: Int = 3): Long = {
    val spark = batch.sparkSession
    val signed = batch
      .select(col(idCol).as("id"),
        graft.functions.functions.image_phash(col(contentCol)).as("ph"))
      .filter(col("ph").isNotNull)
      .select(col("id"), col("ph.ahash").as("sig"))
    // ONE decode+signature pass per micro-batch: the in-batch
    // self-probe, the store probe, and the index write reuse this
    val blk = Dedup.simhashBlocks(signed, bits = 64, blocks).persist()
    try {
      val inBatchDropped = Dedup.probeSimhashBlocks(blk, blk, blocks, maxDist)
        .filter(col("id2") < col("id1"))
        .select(col("id1").as("id")).distinct()
      val inBatchBlk = blk.join(inBatchDropped, Seq("id"), "left_anti")
      val storeDropped = IngestGate.readIfAny(spark, indexDir) match {
        case Some(storeRaw) =>
          val store = storeRaw.filter(col("batch") =!= batchId)
            .select("key", "b", "id", "sig")
          Dedup.probeSimhashBlocks(store, inBatchBlk, blocks, maxDist)
            .select(col("id1").as("id")).distinct()
        case None =>
          import spark.implicits._
          Seq.empty[Long].toDF("id")
      }
      val acceptedBlk = inBatchBlk.join(storeDropped, Seq("id"), "left_anti")
      val rejected = inBatchDropped.union(storeDropped)
        .select(col("id").as(idCol)).distinct()
      val accepted = batch.join(rejected, Seq(idCol), "left_anti").persist()
      try {
        val nAccepted = accepted.count()
        accepted.write.mode("overwrite")
          .parquet(s"$acceptedDir/batch=$batchId")
        acceptedBlk.select(col("key"), col("b"), col("id"), col("sig"))
          .write.mode("overwrite")
          .parquet(s"$indexDir/batch=$batchId")
        nAccepted
      } finally { accepted.unpersist(false); () }
    } finally { blk.unpersist(false); () }
  }

  /** Run the gate over a streaming (id, content) image feed. */
  def start(images: DataFrame, indexDir: String, acceptedDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      contentCol: String = "content", blocks: Int = 4,
      maxDist: Int = 3): StreamingQuery = {
    require(images.isStreaming, "PhashGate.start needs a streaming " +
      "input; use Multimodal.newVsCorpusPhash for a one-shot batch")
    images.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        gateBatch(b, id, indexDir, acceptedDir, idCol, contentCol,
          blocks, maxDist)
        ()
      }
      .start()
  }
}
