package graft.ops

import graft.{SparkSpec, Tables}
import graft.streaming.IngestGate
import org.apache.spark.sql.functions._

/** Epoch compaction ([[Compaction]]): reads identical before/after,
  * epoch-directory count collapses to one, the stream keeps appending
  * afterwards, and NEW epochs stay replay-idempotent. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val vocab: IndexedSeq[String] = (0 until 150).map(i => s"c$i")
  private def mkText(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private def epochDirs(dir: String): Int =
    new java.io.File(dir).listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("batch="))

  test("compaction collapses epochs, preserves content + nested layout, and the gate continues") {
    val idx = graft.Staging.dirFor("compact-idx")
    val acc = graft.Staging.dirFor("compact-acc")
    val ann = graft.Staging.dirFor("compact-ann")
    val vecs = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    def doc(id: Long) = (id, mkText(id.toInt), vecs(id))
    val trainDf = Tables.embeddings(spark, sf001).filter($"vec_id" < 40)
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = IvfIndex.train(trainDf, "id", "vec", k = 4)
    val cb = PqIndex.train(trainDf, "id", "vec", m = 4, k = 8)
    val annSink = Some(IngestGate.AnnSink(ann, "vec", cents, cb))
    (0 until 4).foreach { e =>
      val b = Seq(doc(e * 3 + 1L), doc(e * 3 + 2L)).toDF("doc_id", "text", "vec")
      IngestGate.gateBatch(b, e.toLong, idx, acc, "doc_id", "text", ann = annSink)
    }
    val before = spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
    val annBefore = spark.read.parquet(ann).select("id").as[Long].collect().toSet
    assert(epochDirs(acc) == 4 && epochDirs(ann) == 4)

    Compaction.compactAll(spark, acc, idx, Some(ann))

    assert(epochDirs(acc) == 1 && epochDirs(idx) == 1 && epochDirs(ann) == 1)
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet == before)
    assert(spark.read.parquet(ann).select("id").as[Long].collect().toSet == annBefore)
    // nested cell layout survived: probes still partition-prune and answer
    val queries = Tables.embeddings(spark, sf001)
      .filter($"vec_id" >= 100 && $"vec_id" < 102)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val probed = IvfPq.topK(spark, ann, queries, cents, cb,
      k = 3, nProbe = 4, shortlist = 64)
    assert(probed.count() > 0)
    assert(probed.queryExecution.executedPlan.toString.contains("PartitionFilters"))

    // the gate continues appending, and a NEW epoch replay stays idempotent
    val b9 = Seq(doc(30L), doc(31L)).toDF("doc_id", "text", "vec")
    assert(IngestGate.gateBatch(b9, 9L, idx, acc, "doc_id", "text", ann = annSink) == 2L)
    assert(IngestGate.gateBatch(b9, 9L, idx, acc, "doc_id", "text", ann = annSink) == 2L,
      "post-compaction epoch replay must not self-reject")
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      == before ++ Set(30L, 31L))
    // a near-dup of a COMPACTED doc is still rejected via the base index
    val dup = {
      val t = mkText(1).split(" "); t(10) = "EDITED"
      Seq((99L, t.mkString(" "), vecs(5L))).toDF("doc_id", "text", "vec")
    }
    assert(IngestGate.gateBatch(dup, 10L, idx, acc, "doc_id", "text", ann = annSink) == 0L,
      "compacted epochs must still gate near-dups")
  }
}
