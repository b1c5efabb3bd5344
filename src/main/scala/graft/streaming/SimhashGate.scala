package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SIMHASH ingestion gate — Manku WWW'07's actual production
  * setting ("detecting near-duplicates for web CRAWLING"): reject an
  * arriving page whose 60-bit signature sits within Hamming distance
  * `maxDist` of any already-stored page, in the accumulated-store gate
  * family next to [[IngestGate]] (banded Jaccard), [[ContainmentGate]]
  * (quotes/supersets) and [[ParagraphGate]] (block granularity). The
  * simhash gate is the cheapest of the four per arrival — signing is
  * one token scan, the probe carries `blocks` longs per doc, and the
  * candidate stage is LOSSLESS at maxDist ≤ blocks−1 (pigeonhole), so
  * what it accepts is exactly what the batch operator
  * ([[graft.ops.Dedup.newVsCorpusSimhash]]) would accept. Per
  * micro-batch:
  *
  *   1. in-batch collapse: among arrivals within `maxDist` of each
  *      other, the SMALLEST id survives (block self-join → dominance
  *      anti-join — linear in block-bucket occupancy, never pairwise
  *      across the batch);
  *   2. survivors probe the accumulated block-row store
  *      ([[graft.ops.Dedup.probeSimhash]]): any arrival within
  *      `maxDist` of a STORED doc is rejected — stored content wins;
  *   3. accepted docs append to the corpus sink AND their block rows
  *      to the store, so batch N+1's probe sees batch N's acceptances.
  *
  * Replay idempotence ([[IngestGate]]'s discipline): overwrite-by-epoch
  * sinks, and the probe excludes `batch = batchId` from the store read
  * — a foreachBatch retry would otherwise find its own block rows at
  * distance 0, self-reject the whole epoch, and overwrite its committed
  * output with an empty directory.
  */
object SimhashGate {

  /** Gate ONE batch. Returns the number of accepted documents. */
  def gateBatch(batch: DataFrame, batchId: Long, indexDir: String,
      acceptedDir: String, idCol: String, textCol: String,
      bits: Int = 60, blocks: Int = 4, maxDist: Int = 3): Long = {
    val spark = batch.sparkSession
    // ONE signature pass and ONE block derivation per micro-batch: the
    // in-batch self-probe, the store probe, and the index write all
    // reuse this persisted relation
    val blk = Dedup.simhashBlocks(
      Dedup.simhashSignatures(batch, idCol, textCol,
        Dedup.md5TokenHash60, bits),
      bits, blocks).persist()
    try {
      // (1) in-batch collapse: a doc defers to any SMALLER-id arrival
      // within maxDist (two copies arriving together never both pass)
      val inBatchDropped = Dedup.probeSimhashBlocks(blk, blk, blocks, maxDist)
        .filter(col("id2") < col("id1"))
        .select(col("id1").as("id")).distinct()
      val inBatchBlk = blk.join(inBatchDropped, Seq("id"), "left_anti")
      // (2) probe the accumulated store, excluding this epoch (replay)
      val storeDropped = IngestGate.readIfAny(spark, indexDir) match {
        case Some(storeRaw) =>
          val store = storeRaw.filter(col("batch") =!= batchId)
            .select("key", "b", "id", "sig")
          Dedup.probeSimhashBlocks(store, inBatchBlk, blocks, maxDist)
            .select(col("id1").as("id")).distinct()
        case None => // no prior epochs — nothing to defer to
          import spark.implicits._
          Seq.empty[Long].toDF("id")
      }
      val acceptedBlk = inBatchBlk.join(storeDropped, Seq("id"), "left_anti")
      // a doc with NO signature (null/empty text) can match nothing and
      // always passes — the unshingled-doc convention of the gate family
      val rejected = inBatchDropped.union(storeDropped)
        .select(col("id").as(idCol)).distinct()
      val accepted = batch.join(rejected, Seq(idCol), "left_anti").persist()
      try {
        val nAccepted = accepted.count()
        // overwrite-by-epoch: a replayed batch replaces its own output
        accepted.write.mode("overwrite")
          .parquet(s"$acceptedDir/batch=$batchId")
        // canonical store order (the anti-join moved its key first)
        acceptedBlk.select(col("key"), col("b"), col("id"), col("sig"))
          .write.mode("overwrite")
          .parquet(s"$indexDir/batch=$batchId")
        nAccepted
      } finally { accepted.unpersist(false); () }
    } finally { blk.unpersist(false); () }
  }

  /** Run the gate over a streaming document feed. */
  def start(docs: DataFrame, indexDir: String, acceptedDir: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", bits: Int = 60, blocks: Int = 4,
      maxDist: Int = 3): StreamingQuery = {
    require(docs.isStreaming, "SimhashGate.start needs a streaming " +
      "input; use Dedup.newVsCorpusSimhash for a one-shot batch")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        gateBatch(b, id, indexDir, acceptedDir, idCol, textCol,
          bits, blocks, maxDist)
        ()
      }
      .start()
  }
}
