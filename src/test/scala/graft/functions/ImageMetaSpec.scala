package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.SparkSpec
import javax.imageio.ImageIO
import org.apache.spark.sql.functions.col

/** The header probe ([[ImageMeta]]) against REAL encoder output: bytes
  * produced by the JDK's PNG/JPEG/GIF writers must parse to the exact
  * dimensions they were written with, hand-crafted headers pin the
  * byte-offset arithmetic, and malformed blobs yield NULL (data, not
  * errors). Plan side: the probe runs inside whole-stage codegen, and
  * a meta-only projection over `binaryFile` must not read `content`.
  */
class ImageMetaSpec extends SparkSpec {
  import spark.implicits._

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 7) % 256 << 16) | ((y * 11) % 256 << 8) | 128)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def parseOne(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    val r = Seq(Tuple1(bytes)).toDF("content")
      .select(functions.image_meta(col("content")).as("m"))
      .select("m.format", "m.width", "m.height").collect().head
    if (r.isNullAt(0)) None else Some((r.getString(0), r.getInt(1), r.getInt(2)))
  }

  test("real encoder bytes parse to the written dimensions") {
    assert(parseOne(encode("png", 33, 17)) == Some(("png", 33, 17)))
    assert(parseOne(encode("jpg", 40, 25)) == Some(("jpeg", 40, 25)))
    assert(parseOne(encode("gif", 12, 9)) == Some(("gif", 12, 9)))
  }

  test("hand-crafted PNG header pins the offset arithmetic") {
    // magic + IHDR length/type + width=0x01020304, height=0x00000005
    val b = Array[Int](
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x01, 0x02, 0x03, 0x04, 0x00, 0x00, 0x00, 0x05).map(_.toByte)
    assert(parseOne(b) == Some(("png", 0x01020304, 5)))
  }

  test("malformed and truncated blobs yield null, never throw") {
    assert(parseOne("not an image at all".getBytes) == None)
    assert(parseOne(Array[Byte](0x89.toByte, 0x50)) == None)         // truncated PNG
    assert(parseOne(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01)) == None) // garbage JPEG walk
    assert(parseOne(Array.empty[Byte]) == None)
    val nullRow = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("content")
      .select(functions.image_meta(col("content")).as("m")).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("plan: probe stays inside whole-stage codegen") {
    // a real scan, not a local relation — constant folding would
    // otherwise evaluate the probe at plan time and leave no span
    val df = spark.read.format("binaryFile").load("/root/repo/fixtures/images")
      .select(functions.image_meta(col("content")).as("m"))
    df.collect()
    // the text form prints codegen as the `*(n)` star, so check the tree
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, "image_meta must not break the codegen span")
  }

  test("plan: a path/length-only projection over binaryFile never reads content") {
    val df = spark.read.format("binaryFile").load("/root/repo/fixtures/images")
      .select("path", "length")
    val schema = df.queryExecution.executedPlan.toString
    assert(!schema.contains("content"),
      s"listing projection must prune the content column:\n$schema")
  }
}
