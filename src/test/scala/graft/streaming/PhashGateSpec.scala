package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming image ingestion gate ([[PhashGate]]): in-batch collapse
  * of simultaneous near-copies, cross-epoch rejection of re-encodes of
  * accepted content, undecodable-blob pass-through, and replay
  * idempotence — over the COMMITTED image fixtures (the planted
  * byte-copy/re-encode geometry the manifest pins). */
class PhashGateSpec extends SparkSpec {
  import spark.implicits._

  private def bytesOf(name: String): Array[Byte] =
    Files.readAllBytes(
      Paths.get(s"${graft.Tables.fixturesDir}/images_dup/$name"))

  private def acceptedIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").as[Long].collect().toSet

  test("gate semantics: in-batch collapse, cross-epoch re-encode rejection, garbage passes, replay idempotent") {
    val root = graft.Staging.dirFor("phash-gate-spec")
    val idx = s"$root/index"
    val acc = s"$root/accepted"
    // batch 0: an original, its simultaneous byte copy (in-batch
    // collapse — smaller id wins), and an unrelated scene
    val b0 = Seq(
      (1L, bytesOf("dup_s00_base.png")),
      (2L, bytesOf("dup_s00_copy.png")),
      (3L, bytesOf("dup_s03_base.png"))
    ).toDF("doc_id", "content")
    assert(PhashGate.gateBatch(b0, 0L, idx, acc, "doc_id", "content") == 2L)
    assert(acceptedIds(s"$acc/batch=0") == Set(1L, 3L),
      "the byte copy must defer to the smaller-id original")
    // batch 1: a JPEG re-encode of accepted content (reject), a
    // one-pixel edit of nothing-stored (accept), a fresh scene
    // (accept), and an undecodable blob (always passes — unsigned)
    val b1 = Seq(
      (10L, bytesOf("dup_s00_q90.jpg")),
      (11L, bytesOf("dup_s01_pixel.png")),
      (12L, bytesOf("dup_s05_base.png")),
      (13L, "not an image at all".getBytes("UTF-8"))
    ).toDF("doc_id", "content")
    assert(PhashGate.gateBatch(b1, 1L, idx, acc, "doc_id", "content") == 3L)
    assert(acceptedIds(s"$acc/batch=1") == Set(11L, 12L, 13L),
      "the re-encode of stored content must be rejected; garbage passes")
    // batch 2: a re-encode of batch 1's acceptance (the s01 scene) —
    // cross-epoch memory via the accumulated store
    val b2 = Seq((20L, bytesOf("dup_s01_base.png"))).toDF("doc_id", "content")
    assert(PhashGate.gateBatch(b2, 2L, idx, acc, "doc_id", "content") == 0L)
    // replay of batch 1 (foreachBatch retry): identical acceptances,
    // no self-rejection against its own epoch's block rows
    assert(PhashGate.gateBatch(b1, 1L, idx, acc, "doc_id", "content") == 3L)
    assert(acceptedIds(s"$acc/batch=1") == Set(11L, 12L, 13L))
    // the store holds block rows ONLY for signed acceptances
    val storeIds = spark.read.parquet(idx).select("id").distinct()
      .as[Long].collect().toSet
    assert(storeIds == Set(1L, 3L, 11L, 12L),
      s"store must hold exactly the signed acceptances, got $storeIds")
  }

  test("dual-signature verify end-to-end: an aHash-identical gradient edit is a DIFFERENT image and passes the gate") {
    // Constructed adversarial pair (found by direct search over the
    // committed hash math): both images share the same per-aHash-cell
    // luminance MEANS — aHash distance exactly 0 — but one carries
    // steep within-cell gradients whose 9-grid sampling flips 8 dHash
    // bits. An aHash-only gate would falsely reject the edit as a dup
    // of the base (losing a genuinely distinct image); the dual verify
    // must see a different image and accept BOTH.
    val means = Array(92, 132, 164, 96, 196, 88, 136, 104)
    val slopes = Array(-12, 4, 4, 8, -8, -4, -12, 4)
    def render(withGradients: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      for (y <- 0 until 48; x <- 0 until 64) {
        val c = x / 8
        val v = means(c) +
          (if (withGradients) slopes(c) * (2 * (x % 8) - 7) else 0)
        raster.setSample(x, y, 0, math.max(0, math.min(255, v)))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = render(withGradients = false)
    val edit = render(withGradients = true)
    // the construction must actually hold on the ENCODED bytes
    val hb = graft.functions.ImagePhash.parse(base)
    val he = graft.functions.ImagePhash.parse(edit)
    assert(java.lang.Long.bitCount(hb.getLong(0) ^ he.getLong(0)) == 0,
      "construction: identical aHash")
    assert(java.lang.Long.bitCount(hb.getLong(1) ^ he.getLong(1)) >= 4,
      "construction: dHash beyond the match radius")
    val root = graft.Staging.dirFor("phash-gate-dual")
    val b0 = Seq((1L, base)).toDF("doc_id", "content")
    assert(PhashGate.gateBatch(b0, 0L, s"$root/index", s"$root/acc",
      "doc_id", "content") == 1L)
    // the gradient edit arrives later, plus a true byte copy of base
    val b1 = Seq((10L, edit), (11L, base)).toDF("doc_id", "content")
    assert(PhashGate.gateBatch(b1, 1L, s"$root/index", s"$root/acc",
      "doc_id", "content") == 1L)
    assert(acceptedIds(s"$root/acc/batch=1") == Set(10L),
      "dual verify: the gradient edit is distinct (accepted), the byte copy is a dup (rejected)")
  }

  test("foreachBatch wiring: the streaming form lands the same layouts") {
    val root = graft.Staging.dirFor("phash-gate-stream")
    val src = s"$root/src"
    val images = Seq(
      (1L, bytesOf("dup_s02_base.png")),
      (2L, bytesOf("dup_s02_q70.jpg")),
      (3L, bytesOf("dup_s04_base.png"))
    ).toDF("doc_id", "content")
    images.write.parquet(src)
    val stream = spark.readStream.schema(images.schema).parquet(src)
    val q = PhashGate.start(stream, s"$root/index", s"$root/accepted",
      s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()
    val acc = spark.read.parquet(s"$root/accepted")
      .select("doc_id").as[Long].collect().toSet
    assert(acc == Set(1L, 3L),
      "the q70 re-encode must collapse against the base in-batch")
  }
}
