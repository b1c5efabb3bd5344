package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema, batch iteration via typed
  * `mapPartitions`, partition sizing — is real and tested. The actual
  * codec calls are STUBBED behind [[MediaCodec]] with a deterministic
  * fake (the image/audio libraries are not in this container); swapping
  * in a real decoder changes one function, not the pipeline.
  *
  * Scale notes: media rows are wide (MBs); pipelines must set
  * `spark.sql.files.maxPartitionBytes` so a partition of binaries fits
  * executor memory, and metadata-only queries must never read the binary
  * column — which parquet column pruning gives us for free since content
  * and metadata are separate columns.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int,
      nFrames: Int, sampleRateHz: Int, nBytes: Long)
  case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      nFrames: Int, brightness: Double)

  /** STUB codec: deterministic fake decode deriving metadata purely from
    * the byte content. Replace with a real image/audio library in
    * production — the signature (bytes → metadata/features) is the
    * integration point. */
  object MediaCodec {
    /** STUB — real impl: image header parse (PNG/JPEG). Deterministic
      * fake: dimensions derived from byte length and first bytes. */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      val n = if (bytes == null) 0L else bytes.length.toLong
      MediaMeta(
        format = if (n % 2 == 0) "png" else "jpeg",
        width = (16 + n % 64).toInt,
        height = (16 + (n * 7) % 64).toInt,
        nFrames = (n % 8 + 1).toInt,
        sampleRateHz = 16000,
        nBytes = n)
    }
    /** STUB — real impl: pixel decode + mean luminance. Deterministic
      * fake: mean byte value scaled to [0,1]. */
    def extractFeatures(bytes: Array[Byte]): Double = {
      if (bytes == null || bytes.isEmpty) 0.0
      else {
        var s = 0L; var i = 0
        while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
        math.round(s.toDouble / bytes.length / 255.0 * 10000).toDouble / 10000.0
      }
    }
  }

  /** Attach a deterministic fake binary payload to a text corpus (the
    * test stand-in for real media ingestion: content bytes are the UTF-8
    * text, which makes every downstream metadata value reproducible). */
  def withFakeBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("content"))

  /** Decode metadata for each media row via typed mapPartitions — the
    * batch shape a real codec needs (one codec init per partition, not
    * per row). */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs initialize native state here, once per partition
        it.map { case (id, bytes) => MediaRow(id, bytes, MediaCodec.decodeMeta(bytes)) }
      }
  }

  /** Feature extraction (decode + reduce) keeping only narrow outputs —
    * the binary never leaves the executor. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = MediaCodec.decodeMeta(bytes)
          MediaFeatures(id, m.width, m.height, m.nFrames, MediaCodec.extractFeatures(bytes))
        }
      }
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `stride`-th frame) — pure relational explode over the metadata, no
    * decode needed until the frame is actually read. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.select(col("doc_id"), col("nFrames"),
      explode(sequence(lit(0), col("nFrames") - 1, lit(stride))).as("frame_idx"))

  /** The on-disk PERCEPTUAL image near-dup index — the image member of
    * the incremental-probe family (text simhash:
    * [[Dedup.writeSimhashIndex]]; banded MinHash: [[Dedup.bandIndex]];
    * …): `sigs` is an (id, sig) relation of 64-bit [[
    * graft.functions.ImagePhash]] aHashes (computed in the image scan
    * — bytes never reach this function), landed as Manku block rows
    * under `path/blocks/batch=<epoch>/b=<block>`, the simhash serving
    * store's exact layout — so [[Retraction.retract]] epoch sweeps and
    * [[Compaction.compactEpochs]] apply unchanged, and a probe's
    * block-equality join prunes to block directories. */
  def appendPhashIndexEpoch(sigs: DataFrame, path: String,
      epoch: Long, blocks: Int = 4): Unit =
    Dedup.simhashBlocks(sigs.select(col("id"), col("sig")), bits = 64,
        blocks = blocks)
      .repartition(col("b"))
      .sortWithinPartitions(col("key"))
      .write.mode("overwrite").partitionBy("b")
      .parquet(s"$path/blocks/batch=$epoch")

  /** Probe a NEW batch of image signatures against an
    * [[appendPhashIndexEpoch]] store: every (new, stored) pair within
    * Hamming `maxDist` — crawl-ingest image dedup, LOSSLESS for
    * maxDist ≤ blocks−1 by the pigeonhole argument the text store
    * rides. Only the arrivals are decoded/signed; the store is probed
    * by (b, key) equality with the full signature riding the block
    * rows (verification never re-reads an image). Emits
    * (id1 = new, id2 = stored, dist). */
  def newVsCorpusPhash(spark: SparkSession, path: String,
      newSigs: DataFrame, maxDist: Int = 3, blocks: Int = 4): DataFrame =
    Dedup.probeSimhash(spark.read.parquet(s"$path/blocks"),
      newSigs.select(col("id"), col("sig")), bits = 64, blocks = blocks,
      maxDist = maxDist)

  /** Metadata-only projection used by the SQL-oracle query: everything
    * here is derivable from byte length, exercising the rule that
    * metadata queries must not decode (or even read) content. */
  def metaProjection(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("content")).cast("long").as("n_bytes"))
      .withColumn("format", when(col("n_bytes") % 2 === 0, "png").otherwise("jpeg"))
      .withColumn("width", (lit(16) + col("n_bytes") % 64).cast("int"))
      .withColumn("height", (lit(16) + (col("n_bytes") * 7) % 64).cast("int"))
      .withColumn("n_frames", (col("n_bytes") % 8 + 1).cast("int"))
}
