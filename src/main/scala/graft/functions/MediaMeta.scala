package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Audio/video sibling of [[ImageMeta]] (round-10 directive #7):
  * container-header parse for opaque media blobs — `binary` →
  * `struct<format, duration_ms, channels, sample_rate, width, height>`
  * from the leading container structures alone.
  *
  *   - WAV (RIFF): chunk walk over `fmt ` (channels, sample rate, byte
  *     rate) and `data` (payload size — only its 8-byte chunk HEADER is
  *     read, never the samples); duration = data bytes / byte rate.
  *   - MP4 (ISO BMFF): top-level box walk to `moov`; `mvhd` gives
  *     timescale + duration (both version 0 and 1 layouts), the first
  *     `trak`→`tkhd` with nonzero dimensions gives width/height
  *     (16.16 fixed point).
  *
  * Same O(header) contract as the image probe: bytes stay uninterpreted
  * except at this one edge, cost is independent of blob size, full
  * decode stays behind the batch-UDF boundary ([[graft.ops.Multimodal]]).
  * Unrecognized/truncated input yields NULL — malformed blobs are data,
  * not errors. Fields that a container does not carry are 0 (channels/
  * sample_rate for video, width/height for audio), keeping the struct
  * non-nullable inside and the relational side simple.
  */
object MediaMeta {
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  private def row(format: String, durMs: Long, ch: Int, rate: Int,
      w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(format), durMs, ch, rate, w, h))

  /** Called from both interpreted eval and generated Java. Returns null
    * for anything it cannot prove. */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    // ---- WAV: "RIFF"<size>"WAVE" then aligned chunk walk ----
    if (n >= 12 && fourcc(bytes, 0, "RIFF") && fourcc(bytes, 8, "WAVE")) {
      var channels = 0; var rate = 0; var byteRate = 0L
      var dataSize = -1L; var haveFmt = false
      var i = 12
      while (i + 8 <= n && (!haveFmt || dataSize < 0)) {
        val sz = le32(bytes, i + 4)
        if (fourcc(bytes, i, "fmt ")) {
          if (sz < 16 || i + 8 + 16 > n) return null
          channels = le16(bytes, i + 10)
          rate = le32(bytes, i + 12).toInt
          byteRate = le32(bytes, i + 16)
          haveFmt = true
        } else if (fourcc(bytes, i, "data")) {
          dataSize = sz // size field only — the samples are never read
        }
        i += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
        if (sz < 0 || i < 0) return null
      }
      if (!haveFmt || dataSize < 0) return null
      val durMs = if (byteRate > 0) dataSize * 1000L / byteRate else 0L
      return row("wav", durMs, channels, rate, 0, 0)
    }
    // ---- MP4 / ISO BMFF: box walk to moov → mvhd (+ trak→tkhd) ----
    if (n >= 12 && fourcc(bytes, 4, "ftyp")) {
      var i = 0
      while (i + 8 <= n) {
        var sz = be32(bytes, i)
        var hdr = 8
        if (sz == 1) { // 64-bit extended size
          if (i + 16 > n) return null
          sz = be64(bytes, i + 8); hdr = 16
        }
        if (sz < hdr) return null
        if (fourcc(bytes, i + 4, "moov"))
          return parseMoov(bytes, i + hdr, math.min(i + sz, n.toLong).toInt)
        i = (i + sz).toInt
        if (i < 0) return null
      }
      return null
    }
    null
  }

  /** Walk moov children in [from, to): mvhd → timescale/duration,
    * first trak→tkhd with nonzero dims → width/height. */
  private def parseMoov(b: Array[Byte], from: Int, to: Int): InternalRow = {
    var timescale = 0L; var duration = -1L
    var w = 0; var h = 0
    var i = from
    while (i + 8 <= to) {
      val sz = be32(b, i)
      if (sz < 8) return null
      if (fourcc(b, i + 4, "mvhd") && i + 8 + 4 <= to) {
        val v = b(i + 8) & 0xff
        if (v == 1 && i + 8 + 28 + 4 <= to) {
          timescale = be32(b, i + 8 + 20)
          duration = be64(b, i + 8 + 24)
        } else if (v == 0 && i + 8 + 20 <= to) {
          timescale = be32(b, i + 8 + 12)
          duration = be32(b, i + 8 + 16)
        }
      } else if (fourcc(b, i + 4, "trak") && w == 0) {
        // nested walk for tkhd — width/height are the two trailing
        // 16.16 fixed-point ints of its fixed-size layout
        var j = i + 8
        val end = math.min(i + sz, to.toLong).toInt
        while (j + 8 <= end && w == 0) {
          val csz = be32(b, j)
          if (csz < 8) return null
          if (fourcc(b, j + 4, "tkhd")) {
            val v = b(j + 8) & 0xff
            val off = if (v == 1) j + 8 + 88 else j + 8 + 76
            if (off + 8 <= end) {
              w = (be32(b, off) >> 16).toInt
              h = (be32(b, off + 4) >> 16).toInt
            }
          }
          j = (j + csz).toInt
          if (j < 0) return null
        }
      }
      i = (i + sz).toInt
      if (i < 0) return null
    }
    if (duration < 0 || timescale <= 0) return null
    row("mp4", duration * 1000L / timescale, 0, timescale.toInt, w, h)
  }

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
}

/** `media_meta(content)` — header-only audio/video container probe.
  * One static call per row in generated code, same codegen shape as
  * [[ImageMetaExpr]]. */
case class MediaMetaExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "media_meta"
  override def dataType: DataType = MediaMeta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MediaMeta.parse($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
