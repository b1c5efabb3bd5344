package graft.ops

import graft.SparkSpec
import graft.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.withFakeBinary(Tables.documents(spark, sf001), "doc_id", "text")

  test("binary schema: content is binary, metadata derivable without decode") {
    assert(media.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val meta = Multimodal.metaProjection(media)
    val row = meta.orderBy($"doc_id").head()
    assert(row.getAs[Long]("n_bytes") > 0)
    assert(row.getAs[Int]("width") >= 16 && row.getAs[Int]("width") < 80)
  }

  test("typed mapPartitions decode produces consistent metadata") {
    val decoded = Multimodal.decodeMeta(spark, media.limit(50))
    val metas = decoded.collect()
    assert(metas.length == 50)
    metas.foreach { m =>
      assert(m.meta.nBytes == m.content.length.toLong)
      assert(m.meta.width == (16 + m.meta.nBytes % 64).toInt)
    }
  }

  test("feature extraction keeps narrow output and deterministic values") {
    val feats = Multimodal.extractFeatures(spark, media.limit(20)).collect()
    assert(feats.length == 20)
    assert(feats.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(spark, media.limit(20)).collect()
    assert(feats.map(f => (f.doc_id, f.brightness)).toSet ==
      again.map(f => (f.doc_id, f.brightness)).toSet)
  }

  test("frame sampling explodes stride-spaced frame indexes") {
    val meta = Multimodal.metaProjection(media.limit(10))
      .select($"doc_id", $"n_frames".as("nFrames"))
    val frames = Multimodal.sampleFrames(meta, stride = 2).collect()
    frames.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val idx = rows.map(_.getAs[Int]("frame_idx")).sorted
      assert(idx.head == 0 && idx.forall(_ % 2 == 0))
    }
  }
}
