package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual image hashing ([[ImagePhash]]): the crafted-case
  * geometry the near-dup family depends on (re-encode and one-pixel
  * edits stay inside the Manku radius, distinct scenes far outside),
  * NULL-not-throw on garbage, degenerate dimensions, and the
  * committed-fixture pin: the expression over the committed bytes must
  * reproduce the write-time manifest signatures exactly. The
  * cross-engine gate is the `multimodal_phash_dedup` oracle. */
class ImagePhashSpec extends SparkSpec {
  import spark.implicits._

  private def scene(seed: Int, w: Int = 64, h: Int = 48): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      var r = (x * 255 / w + seed * 37) % 256
      var g = (y * 255 / h + seed * 53) % 256
      var b = ((x + y) * 255 / (w + h) + seed * 11) % 256
      val rx = (seed * 13) % math.max(1, w / 2)
      val ry = (seed * 7) % math.max(1, h / 2)
      if (x >= rx && x < rx + w / 3 && y >= ry && y < ry + h / 3) {
        r = 255 - r; g = 255 - g
      }
      if (((x + seed * 5) / (w / 4 + 1)) % 2 == 0) b = b / 3
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def jpg(img: BufferedImage, q: Float): Array[Byte] = {
    val w = ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def hashes(bytes: Array[Byte]): Option[(Long, Long)] =
    Option(ImagePhash.parse(bytes)).map(r => (r.getLong(0), r.getLong(1)))

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("crafted geometry: re-encode and one-pixel edit within Hamming 3; distinct scenes at least 8 apart") {
    val imgs = (0 until 6).map(scene(_))
    val base = imgs.map(i => hashes(png(i)).get)
    // identical bytes → identical signature (determinism)
    assert(hashes(png(imgs.head)).get == base.head)
    // JPEG re-encodes at two qualities stay within the Manku radius
    for ((img, i) <- imgs.zipWithIndex; q <- Seq(0.9f, 0.7f)) {
      val (a, d) = hashes(jpg(img, q)).get
      assert(ham(a, base(i)._1) <= 3, s"scene $i q=$q ahash drifted ${ham(a, base(i)._1)}")
      assert(ham(d, base(i)._2) <= 3, s"scene $i q=$q dhash drifted ${ham(d, base(i)._2)}")
    }
    // one-pixel edit is perceptually invisible
    val edited = scene(1)
    edited.setRGB(5, 5, 0xffffff)
    val (ea, ed) = hashes(png(edited)).get
    assert(ham(ea, base(1)._1) <= 3 && ham(ed, base(1)._2) <= 3)
    // distinct scenes are far apart — the banding separation margin
    for (i <- imgs.indices; j <- imgs.indices if i < j)
      assert(ham(base(i)._1, base(j)._1) >= 8,
        s"scenes $i,$j only ${ham(base(i)._1, base(j)._1)} bits apart")
  }

  test("garbage, empty, and truncated inputs yield NULL; degenerate sizes decode") {
    assert(ImagePhash.parse(null) == null)
    assert(ImagePhash.parse(Array.emptyByteArray) == null)
    assert(ImagePhash.parse("not an image at all".getBytes("UTF-8")) == null)
    assert(ImagePhash.parse(png(scene(0)).take(20)) == null,
      "truncated PNG must yield NULL, not throw")
    // narrower/shorter than the 9x8 grid: cells widen to one pixel
    assert(hashes(png(scene(3, w = 5, h = 3))).isDefined)
    assert(hashes(png(scene(3, w = 1, h = 1))).isDefined)
  }

  test("committed fixtures: the expression over the bytes reproduces the write-time manifest signatures, and clusters == planted scenes") {
    val dir = graft.Tables.fixturesDir
    val computed = spark.read.format("binaryFile").load(s"$dir/images_dup")
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        graft.functions.functions.image_phash(col("content")).as("ph"))
      .select(col("file"), col("ph.ahash").as("ahash"), col("ph.dhash").as("dhash"))
    val manifest = spark.read.parquet(s"$dir/images_dup_manifest.parquet")
    assert(computed.join(manifest, Seq("file", "ahash", "dhash")).count() ==
      manifest.count(), "every committed blob must hash to its manifest row")
    // the end-to-end dedup recovers exactly the generator's scenes
    val out = graft.queries.QueryCatalog.multimodalPhashDedup(spark, sf001)
      .select(col("file"), col("exemplar"))
    val withScene = out.join(manifest.select(col("file"), col("scene")), Seq("file"))
    assert(withScene.select(col("scene"), col("exemplar")).distinct().count() ==
      manifest.select(col("scene")).distinct().count(),
      "each scene must collapse to exactly one exemplar")
    assert(withScene.select(col("exemplar")).distinct().count() ==
      manifest.select(col("scene")).distinct().count(),
      "no two scenes may share an exemplar")
  }
}
