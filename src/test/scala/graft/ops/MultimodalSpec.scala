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

  test("phash store lifecycle: append epochs probe like one store; retraction removes the forgotten image; compaction preserves probes") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // signatures straight from the committed manifest (pinned by the
    // multimodal_phash_dedup gate — this test is about the STORE)
    val sigs = spark.read
      .parquet(s"${graft.Tables.fixturesDir}/images_dup_manifest.parquet")
      .select(Dedup.md5TokenHash60(col("file")).as("id"),
        col("ahash").as("sig"), col("file"))
      .localCheckpoint()
    val store = sigs.filter(!col("file").rlike("copy|q90|q70|pixel"))
      .select("id", "sig")
    val arrivals = sigs.filter(col("file").rlike("copy|q90|q70|pixel"))
      .select("id", "sig")
    val dir = graft.Staging.dirFor("phash-lifecycle")
    // two epochs by id parity ≡ one store
    Multimodal.appendPhashIndexEpoch(store.filter($"id" % 2 === 0), dir, 0L)
    Multimodal.appendPhashIndexEpoch(store.filter($"id" % 2 =!= 0), dir, 1L)
    def probe() = Multimodal.newVsCorpusPhash(spark, dir, arrivals)
      .as[(Long, Long, Long)].collect().toSet
    val before = probe()
    assert(before.size == 5, s"all planted arrivals must match: $before")
    // retraction: forget one matched store image — its pairs vanish,
    // everything else byte-identical semantics
    val victim = before.head._2
    Retraction.retract(spark, s"$dir/blocks", "id", Seq(victim),
      nestedPartCols = Seq("b"))
    val after = probe()
    assert(after == before.filterNot(_._2 == victim),
      "retraction must remove exactly the victim's pairs")
    // compaction collapses epochs; probes unchanged
    val n = Compaction.compactEpochs(spark, s"$dir/blocks", maxEpochId = 1L,
      nestedPartCols = Seq("b"))
    assert(n > 0, "compaction must collapse the two epochs")
    assert(probe() == after, "compaction must not change any probe")
  }
}
