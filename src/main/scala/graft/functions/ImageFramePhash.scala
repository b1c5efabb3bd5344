package graft.functions

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-FRAME perceptual signatures for MULTI-FRAME media (animated
  * GIF — the one multi-frame container the JDK decodes natively):
  * `binary` → `array<struct<frame_idx: int, ahash: bigint,
  * dhash: bigint>>` — the video member of the dedup family's
  * signature layer. A re-posted clip (same scenes, new container, an
  * extra intro frame, a trimmed tail) shares most of its per-frame
  * signatures with the original even though no bytes match; scene-level
  * near-dup is then pure relational machinery over the exploded
  * (file, frame_idx, ahash, dhash) rows — the same Manku banding +
  * dual-hash verify the single-image path rides
  * ([[graft.ops.Multimodal]]).
  *
  * Semantics: frame rasters are hashed AS STORED (each frame's own
  * image data, [[ImagePhash]]'s integer grid math per frame) — the
  * fixtures commit full-raster frames, and delta-encoded frames would
  * hash their stored patch (compositing is codec policy, deliberately
  * out of scope for a signature function). The [[ImagePhash.MaxPixels]]
  * decompression-bomb guard applies per frame via the header probe;
  * frame count is capped at [[ImageFramePhash.MaxFrames]] (a clip's
  * scene identity lives in its first seconds — and an adversarial
  * million-frame GIF must not own an executor). Undecodable bytes →
  * NULL; a frame that fails mid-sequence ends the array at the frames
  * decoded so far (best-effort, never throws). */
object ImageFramePhash {
  ImageIO.setUseCache(false)

  /** Per-blob frame budget: far above any committed fixture (and any
    * sane thumbnail animation), far below adversarial. */
  val MaxFrames: Int = 64

  def parse(bytes: Array[Byte]): ArrayData = {
    // stream/reader scaffolding and the per-frame decompression-bomb
    // guard are the single-image path's, shared
    ImagePhash.withImageReader[ArrayData](bytes) { reader =>
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var idx = 0
      var done = false
      while (!done && idx < MaxFrames) {
        val row =
          try {
            val img = ImagePhash.guardedRead(reader, idx)
            if (img == null) null
            else {
              val sig = ImagePhash.hashImage(img)
              new GenericInternalRow(Array[Any](idx, sig(0), sig(1)))
            }
          } catch { case _: Exception => null }
        if (row == null) done = true
        else { out += row; idx += 1 }
      }
      if (out.isEmpty) null else new GenericArrayData(out.toArray[Any])
    }
  }

  val elementSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ahash", LongType, nullable = false),
    StructField("dhash", LongType, nullable = false)))
}

/** `image_frame_phashes(content)` — per-frame aHash/dHash signatures
  * for multi-frame media. One static call per row inside whole-stage
  * codegen; only the (frame_idx, 128-bit) rows ever leave the scan. */
case class ImageFramePhashExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "image_frame_phashes"
  override def dataType: DataType = ArrayType(ImageFramePhash.elementSchema,
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageFramePhash.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.ImageFramePhash.parse($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
