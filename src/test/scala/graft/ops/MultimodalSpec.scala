package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("image_frame_phashes: per-frame signatures match the write-time manifest; garbage is NULL") {
    import org.apache.spark.sql.functions._
    val got = spark.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/video")
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        explode(graft.functions.functions.image_frame_phashes(col("content"))).as("fr"))
      .select(col("file"), col("fr.frame_idx"), col("fr.ahash"), col("fr.dhash"))
      .as[(String, Int, Long, Long)].collect().toSet
    val want = spark.read
      .parquet(s"${graft.Tables.fixturesDir}/video_manifest.parquet")
      .select("file", "frame_idx", "ahash", "dhash")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == want, "engine-side frame signatures must reproduce the manifest")
    // undecodable bytes → NULL, never a throw
    val junk = Seq(Array[Byte](1, 2, 3), Array.empty[Byte]).toDF("content")
      .select(graft.functions.functions.image_frame_phashes($"content").as("f"))
      .collect()
    assert(junk.forall(_.isNullAt(0)))
  }

  test("image_frame_phashes caps the frame budget (adversarial million-frame clip)") {
    assert(graft.functions.ImageFramePhash.MaxFrames <= 64,
      "the per-blob frame budget is the executor's protection — keep it bounded")
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
        col("ahash").as("sig"), col("dhash").as("dsig"), col("file"))
      .localCheckpoint()
    val store = sigs.filter(!col("file").rlike("copy|q90|q70|pixel"))
      .select("id", "sig", "dsig")
    val arrivals = sigs.filter(col("file").rlike("copy|q90|q70|pixel"))
      .select("id", "sig", "dsig")
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

  test("phash probe verifies BOTH signatures: an aHash-identical arrival with a far dHash is rejected") {
    val spark2 = spark
    import spark2.implicits._
    val dir = graft.Staging.dirFor("phash-dual-verify")
    // stored image: (sig, dsig). Two arrivals share its aHash exactly
    // (so every block is a candidate hit); only the one whose dHash is
    // also near may pass — the luminance-preserving gradient edit
    // (same cell means vs grid mean, flipped gradient signs) is the
    // attack the aHash-only gate could not see.
    Multimodal.appendPhashIndexEpoch(
      Seq((1L, 0x0F0F0F0F0F0F0F0FL, 0x00FF00FF00FF00FFL))
        .toDF("id", "sig", "dsig"), dir, epoch = 0L)
    val arrivals = Seq(
      (10L, 0x0F0F0F0F0F0F0F0FL, 0x00FF00FF00FF00FEL), // dHash dist 1
      (11L, 0x0F0F0F0F0F0F0F0FL, ~0x00FF00FF00FF00FFL)) // dHash dist 64
      .toDF("id", "sig", "dsig")
    val hits = Multimodal.newVsCorpusPhash(spark, dir, arrivals)
      .as[(Long, Long, Long)].collect().toSet
    assert(hits == Set((10L, 1L, 0L)),
      s"dual verify must accept the near-dHash arrival and reject the gradient flip: $hits")
  }
}
