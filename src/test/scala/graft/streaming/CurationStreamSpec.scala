package graft.streaming

import graft.SparkSpec
import graft.ops.Curation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(86_400_000L + min * 60_000L)

  private val goodText = "the quick brown fox jumps over the lazy dog and " * 12
  private val otherText = "a cat sat on the mat with a hat and that is that " * 10

  test("streaming curation: filter stages stateless, dedup keeps first arrival, TTL suppresses replays") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Timestamp)]
    val curated = CurationStream.curate(
      mem.toDS().toDF("doc_id", "source", "text", "ts"),
      minQuality = 0.3, eventTimeCol = "ts", delay = "1 minute",
      ttlMs = 3_600_000L)
    val q = curated.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curation_out").start()
    try {
      mem.addData(
        (1L, "s1", goodText, ts(0)),
        (2L, "s1", "zzz qqq xxx", ts(0)),  // und → filtered
        (3L, "s1", "a b", ts(0)),          // low quality → filtered
        (4L, "s2", goodText, ts(1)))       // duplicate text, later arrival
      q.processAllAvailable()
      mem.addData(
        (5L, "s3", goodText, ts(2)),       // replay inside TTL → suppressed
        (6L, "s3", otherText, ts(2)))      // new text → passes
      q.processAllAvailable()
      val got = spark.table("curation_out").collect()
        .map(r => r.getAs[Long]("doc_id")).toSet
      assert(got == Set(1L, 6L),
        s"first arrival per digest after filters, got $got")
      // emitted rows carry the scoring projection
      val r1 = spark.table("curation_out").filter($"doc_id" === 1L).head()
      assert(r1.getAs[String]("lang_pred") == "en")
      assert(r1.getAs[Double]("quality") >= 0.3)
      assert(r1.getAs[Long]("n_tokens") > 0)
    } finally q.stop()
  }

  test("streaming result matches batch curation when arrival order = id order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "s1", goodText), (2L, "s1", goodText), (3L, "s2", otherText),
      (4L, "s2", "zzz qqq"), (5L, "s3", "a b"))
    val batch = Curation.curate(
        rows.toDF("doc_id", "source", "text"), "doc_id", "text", 0.3)
      .select("doc_id").as[Long].collect().toSet

    val mem = MemoryStream[(Long, String, String, Timestamp)]
    val curated = CurationStream.curate(
      mem.toDS().toDF("doc_id", "source", "text", "ts"),
      minQuality = 0.3, eventTimeCol = "ts", delay = "1 minute",
      ttlMs = 3_600_000L)
    val q = curated.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curation_parity").start()
    try {
      // one batch, ids in arrival order ⇒ keep-first-arrival ≡ keep-lowest-id
      mem.addData(rows.map { case (id, src, txt) => (id, src, txt, ts(id.toInt)) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("curation_parity").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally q.stop()
  }

  test("scrub + repetition gate compose as stateless prefix stages, batch ≡ stream") {
    // The round-8 quality ops are pure projections, so they slot in
    // front of the stateful dedup in BOTH execution modes unchanged:
    // scrubPii(text) → filter(repetitionKeep) → curate.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.TextAnalysis
    import org.apache.spark.sql.functions.col
    // the suite's goodText/otherText are REPEATED sentences — the
    // repetition gate rightly rejects those; these have all-distinct
    // bigrams plus enough stopwords to pass langId + quality
    val variedA = (1 to 15).map(i => s"the w$i and u$i").mkString(" ")
    val variedB = (1 to 15).map(i => s"is v$i of k$i").mkString(" ")
    val repetitive = ("spam spam " * 40).trim           // top-bigram gate rejects
    val withPii = variedA + " mail me at a@b.io"         // scrubbed, then passes
    val rows = Seq(
      (1L, "s1", withPii), (2L, "s1", repetitive), (3L, "s2", variedB))

    def stages(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("text", TextAnalysis.scrubPii(col("text")))
      .filter(TextAnalysis.repetitionKeep(col("text")))

    val batch = Curation.curate(
        stages(rows.toDF("doc_id", "source", "text")), "doc_id", "text", 0.3)
      .select("doc_id").as[Long].collect().toSet

    val mem = MemoryStream[(Long, String, String, Timestamp)]
    val curated = CurationStream.curate(
      stages(mem.toDS().toDF("doc_id", "source", "text", "ts")),
      minQuality = 0.3, eventTimeCol = "ts", delay = "1 minute",
      ttlMs = 3_600_000L)
    val q = curated.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curation_strict").start()
    try {
      mem.addData(rows.map { case (id, src, txt) => (id, src, txt, ts(id.toInt)) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("curation_strict").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(batch == Set(1L, 3L), s"repetitive doc gated out, PII doc passes: $batch")
      val texts = spark.table("curation_strict").collect()
        .map(_.getAs[String]("text")).mkString
      assert(!texts.contains("a@b.io") && texts.contains("<EMAIL>"),
        "the curated stream must carry the scrubbed text")
    } finally q.stop()
  }

  test("windowed report: closed windows emit curated per-source counts") {
    // report runs as its own query over the curated sink (Spark rejects
    // dedup→window fused in one query — see CurationStream.report doc),
    // so feed it a curated-doc stream directly.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[CurationStream.CuratedDoc]
    val q = CurationStream.report(mem.toDS(), "10 minutes", "1 minute")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curation_report").start()
    def doc(id: Long, src: String, t: Timestamp, quality: Double) =
      CurationStream.CuratedDoc(id, src, s"text $id", t, "en", 10L, quality)
    try {
      mem.addData(
        doc(1L, "s1", ts(0), 0.6), doc(2L, "s1", ts(1), 0.8),
        doc(3L, "s2", ts(2), 0.7))
      q.processAllAvailable()
      // advance the watermark far past the first window so it closes
      mem.addData(doc(4L, "s9", ts(60), 0.5))
      q.processAllAvailable()
      mem.addData(doc(5L, "s9", ts(120), 0.5))
      q.processAllAvailable()
      val rows = spark.table("curation_report")
        .select($"source", $"n_docs", $"sum_tokens", $"avg_quality").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      assert(rows.contains(("s1", 2L, 20L, 0.7)) && rows.contains(("s2", 1L, 10L, 0.7)),
        s"first window must emit curated counts per source: $rows")
    } finally q.stop()
  }

  test("batch input is rejected") {
    val e = intercept[IllegalArgumentException] {
      CurationStream.curate(
        Seq((1L, "s", "t", ts(0))).toDF("doc_id", "source", "text", "ts"),
        0.3, "ts", "1 minute", 1000L)
    }
    assert(e.getMessage.contains("streaming"))
  }
}
