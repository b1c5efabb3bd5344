package graft.functions

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._

/** Perceptual image hashes for NEAR-DUPLICATE dedup over image BYTES:
  * `binary` → `struct<ahash: bigint, dhash: bigint>` — the first dedup
  * pass of a real image/caption pipeline, where the corpus has no
  * embeddings yet (those arrive long after ingest dedup) and an exact
  * byte hash misses every re-encode.
  *
  * The two classic 64-bit signatures (Krawetz's aHash / dHash — "kind
  * of like a hash" family, public algorithm):
  *   - decode the image (JDK `javax.imageio` — PNG/JPEG/GIF, no
  *     external library, the [[graft.tools.GenImageFixtures]] encoder's
  *     own inverse), but only after a header-only dimension probe
  *     rejects anything over [[ImagePhash.MaxPixels]] — crawl bytes
  *     are untrusted, and a decompression-bomb PNG/GIF (tiny payload,
  *     huge declared W×H) must become NULL at the header, not an
  *     executor-killing gigapixel allocation;
  *   - integer luminance per pixel (299·R + 587·G + 114·B, a ×1000
  *     fixed-point weighting);
  *   - area-average downsample to an 8×8 grid (aHash) and 9×8 grid
  *     (dHash) — integer sums over disjoint pixel blocks with ONE
  *     deterministic truncating integer division per cell, no float
  *     resampling, so the same bytes hash identically on every JVM;
  *   - aHash bit (r,c) = cell > grid mean (compared cross-multiplied:
  *     `cell·64 > Σcells`, no division rounding); dHash bit (r,c) =
  *     cell(r,c) < cell(r,c+1) (the horizontal gradient sign).
  *
  * A re-encode (PNG→JPEG), a quality change, or a one-pixel edit moves
  * 0–2 of the 64 bits (measured on the committed fixture scenes);
  * distinct scenes sit ≥ 8 bits apart (the margin
  * [[graft.tools.GenPhashFixtures]] enforces at write time) — which is
  * exactly the regime
  * Manku-style block banding ([[graft.ops.Dedup.simhashBlocks]], 4
  * blocks × 16 bits, lossless at Hamming ≤ 3) was built for, so the
  * EXISTING simhash candidate machinery serves image near-dup unchanged.
  *
  * Scale shape: the decode runs at the scan edge, executor-local, and
  * only the 128 bits ever shuffle — image bytes NEVER enter an
  * exchange. The expression is the one pixel-interpreting touch-point
  * (the [[ImageMeta]] stance, one static call per row inside
  * whole-stage codegen); malformed/undecodable blobs yield NULL, never
  * throw — at corpus scale they are data, filtered relationally.
  * Like the reference's opaque heterogeneous payloads
  * (controller_test.go:577-593, values stored and round-tripped but
  * never decoded), everything downstream of this call treats content
  * as bytes again.
  */
object ImagePhash {
  // in-memory ImageIO only: the default file-backed stream cache would
  // put a temp-file write on every executor decode
  ImageIO.setUseCache(false)

  /** Decode budget for untrusted bytes: a declared width×height above
    * this (64 MP — far past any sane crawl image, far below the
    * gigapixel allocations a bomb declares) yields NULL without ever
    * allocating the pixel buffer. */
  val MaxPixels: Long = 64L * 1024 * 1024

  /** Exact integer area-average grayscale grid: cell (i,j) averages
    * luminance×1000 over pixel block [i·h/gh,(i+1)·h/gh)×[j·w/gw,
    * (j+1)·w/gw) (bounds floor-mapped; degenerate ranges widened to one
    * pixel so grids wider than the image stay defined). */
  private def grid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val g = new Array[Long](gw * gh)
    var i = 0
    while (i < gh) {
      val y0 = i * h / gh
      val y1 = math.max(y0 + 1, (i + 1) * h / gh)
      var j = 0
      while (j < gw) {
        val x0 = j * w / gw
        val x1 = math.max(x0 + 1, (j + 1) * w / gw)
        var s = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        g(i * gw + j) = s / n
        j += 1
      }
      i += 1
    }
    g
  }

  /** The shared untrusted-bytes reader probe (this expression and
    * [[ImageFramePhash]]): open an in-memory stream, pick the first
    * capable reader, hand it to `f`, release everything — NULL (never
    * a throw) for undecodable bytes. Hardening of the probe (format
    * allowlists, further guards) lands HERE, once, for both phash
    * paths. */
  private[functions] def withImageReader[T >: Null](bytes: Array[Byte])(
      f: javax.imageio.ImageReader => T): T = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try { reader.setInput(iis); f(reader) } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => null }
  }

  /** Decode frame `idx` only if its header-declared dimensions fit the
    * [[MaxPixels]] budget — the decompression-bomb guard shared by both
    * phash paths: a gigapixel declaration becomes NULL at the header,
    * never an executor-killing allocation. */
  private[functions] def guardedRead(reader: javax.imageio.ImageReader,
      idx: Int): java.awt.image.BufferedImage = {
    val w = reader.getWidth(idx).toLong
    val h = reader.getHeight(idx).toLong
    if (w < 1 || h < 1 || w * h > MaxPixels) null else reader.read(idx)
  }

  /** Called from both interpreted eval and generated Java. Null for
    * anything javax.imageio cannot decode — and, BEFORE any pixel
    * allocation, for anything whose header declares more than
    * [[MaxPixels]]. */
  def parse(bytes: Array[Byte]): InternalRow = {
    // withImageReader's own catch converts a decode failure to null
    val img = withImageReader[java.awt.image.BufferedImage](bytes)(
      guardedRead(_, 0))
    if (img == null || img.getWidth < 1 || img.getHeight < 1) return null
    val sig = hashImage(img)
    new GenericInternalRow(Array[Any](sig(0), sig(1)))
  }

  /** The raster → (aHash, dHash) core, shared with the per-frame
    * variant ([[ImageFramePhash]]). */
  private[functions] def hashImage(img: java.awt.image.BufferedImage): Array[Long] = {
    // aHash: 8x8 cells vs the grid mean, compared cross-multiplied
    val a = grid(img, 8, 8)
    var sum = 0L
    var k = 0
    while (k < 64) { sum += a(k); k += 1 }
    var ahash = 0L
    k = 0
    while (k < 64) { if (a(k) * 64 > sum) ahash |= 1L << k; k += 1 }
    // dHash: 9x8 cells, horizontal gradient sign
    val d = grid(img, 9, 8)
    var dhash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (d(r * 9 + c) < d(r * 9 + c + 1)) dhash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    Array(ahash, dhash)
  }

  val schema: StructType = StructType(Seq(
    StructField("ahash", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))
}

/** `image_phash(content)` — perceptual aHash/dHash signature pair. One
  * static call per row (decode + integer grid fold in plain JVM
  * bytecode), so the expression stays inside whole-stage codegen like
  * [[ImageMetaExpr]]. */
case class ImagePhashExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "image_phash"
  override def dataType: DataType = ImagePhash.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImagePhash.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ImagePhash.parse($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
