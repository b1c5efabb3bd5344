package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Format-header parse for opaque media blobs: `binary` →
  * `struct<format, width, height>` from the first bytes alone (magic
  * number, PNG IHDR, JPEG SOF, GIF logical screen descriptor).
  *
  * This is the "bytes we don't interpret except at the edge" story the
  * reference applies to heterogeneous payloads (controller_test.go:577-593
  * — values it stores and round-trips but never decodes), applied to a
  * training corpus's image columns: the engine treats content as an
  * opaque `binary`, and the ONE interpreting touch-point is this
  * expression, which reads O(header) bytes regardless of blob size —
  * no decoder library, no per-pixel work, safe to run inline in a scan
  * over billions of images. Full decode (pixels, resize, embeddings)
  * stays behind the batch-UDF boundary ([[graft.ops.Multimodal]]),
  * which is where a real deployment hangs its native decoder.
  *
  * Unrecognized or truncated headers yield NULL (never throw): at
  * corpus scale malformed blobs are data, not errors — filter or
  * side-output them relationally.
  */
object ImageMeta {
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def row(format: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(format), w, h))

  private val PngMagic: Array[Int] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Called from both interpreted eval and generated Java (static
    * forwarder). Returns null for anything it cannot prove. */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    // PNG: 8-byte magic, then the IHDR chunk is mandatory-first —
    // width/height are the big-endian ints at offsets 16/20.
    if (n >= 24 && (0 until 8).forall(i => (bytes(i) & 0xff) == PngMagic(i)) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      return row("png", be32(bytes, 16), be32(bytes, 20))
    // JPEG: FFD8, then walk segments to the first SOFn (C0-CF minus the
    // non-frame C4/C8/CC): height/width are big-endian at +5/+7.
    if (n >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < n) {
        if ((bytes(i) & 0xff) != 0xff) return null
        // fill bytes: any number of 0xFF may pad before a marker
        if ((bytes(i + 1) & 0xff) == 0xff) { i += 1 }
        else {
          val marker = bytes(i + 1) & 0xff
          if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
          else {
            val segLen = be16(bytes, i + 2)
            if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              if (i + 8 >= n) return null
              return row("jpeg", be16(bytes, i + 7), be16(bytes, i + 5))
            }
            if (segLen < 2) return null
            i += 2 + segLen
          }
        }
      }
      return null
    }
    // GIF: "GIF87a"/"GIF89a", little-endian dims at 6/8.
    if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      return row("gif", le16(bytes, 6), le16(bytes, 8))
    null
  }

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
}

/** `image_meta(content)` — header-only format/dimension probe. The
  * generated code is one static call per row (the parse loop itself is
  * plain JVM bytecode), so the expression stays inside whole-stage
  * codegen like the vector math in [[VectorExprs]]. */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "image_meta"
  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ImageMeta.parse($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
