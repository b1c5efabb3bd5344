package graft.streaming

import graft.SparkSpec
import graft.ops.Profile
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The composed table-health twin ([[HealthStream.tableHealth]]): the
  * two sinks, joined on column name, must equal
  * [[Profile.profileWithQuantiles]] over data-so-far after EVERY
  * micro-batch — the last missing streaming/batch twin pairing. */
class HealthStreamSpec extends SparkSpec {
  import spark.implicits._

  // (id, lang, n_chars, score): one string column (profiled only), two
  // numeric columns (profiled + quantiled); nulls in both kinds
  private val data: Seq[(Long, Option[String], Option[Long], Double)] =
    (1L to 60L).map { i =>
      (i,
        if (i % 7 == 0) None else Some(Seq("en", "de", "fr")((i % 3).toInt)),
        if (i % 11 == 0) Option.empty[Long] else Some((i * 37) % 500),
        ((i * 13) % 97) / 10.0)
    }

  private val cols = Seq("id", "lang", "n_chars", "score")
  private val numCols = Seq("n_chars", "score")
  private val qs = Seq("p50" -> 0.5, "p90" -> 0.9)

  test("assembled stream report ≡ profileWithQuantiles over data-so-far, every micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Option[String], Option[Long], Double)]
    // TTL explicitly OFF here: this matrix needs processAllAvailable's
    // deterministic per-prefix batch boundaries, which STARVE under the
    // default ProcessingTimeTimeout timer sweeps (the KmvStream
    // scaladoc caveat). The inherited-default policy itself is pinned
    // in KmvSketchSpec's default-policy case.
    val (prof, quant) = HealthStream.tableHealth(
      mem.toDF().toDF("id", "lang", "n_chars", "score"),
      cols, numCols, idCol = "id", seed = "hs", k = 16, qs = qs.map(_._2),
      inactivityTtl = None)
    val q1 = prof.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("hs_prof").start()
    val q2 = quant.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("hs_quant").start()
    try {
      data.grouped(20).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk: _*)
        q1.processAllAvailable(); q2.processAllAvailable()
        val soFar = data.take((i + 1) * 20)
          .toDF("id", "lang", "n_chars", "score")
        // approxNdv on the batch side too: the stream's ndv IS the HLL
        // sketch (exact multi-distinct is not a streaming aggregate)
        val batch = Profile.profileWithQuantiles(soFar, cols, numCols,
            idCol = "id", seed = "hs", k = 16, qs = qs, approxNdv = true)
          .collect().map { r =>
            r.getAs[String]("col_name") -> (
              (r.getAs[Long]("n_nonnull"), r.getAs[Long]("ndv"),
                r.getAs[String]("min_val"), r.getAs[String]("max_val")),
              if (r.isNullAt(r.fieldIndex("m_sample"))) null
              else (r.getAs[Long]("m_sample"),
                qs.map { case (n, _) => r.getAs[Double](n) }))
          }.toMap
        // assemble the stream's current report: profile sink + the
        // LATEST quantile emission per column
        val profNow = spark.table("hs_prof").collect().map { r =>
          r.getAs[String]("col_name") -> ((r.getAs[Long]("n_nonnull"),
            r.getAs[Long]("ndv"), r.getAs[String]("min_val"),
            r.getAs[String]("max_val")))
        }.toMap
        val quantNow = spark.table("hs_quant").collect().zipWithIndex
          .groupBy(_._1.getString(0))
          .map { case (g, rows) =>
            val r = rows.maxBy(_._2)._1
            g -> ((r.getInt(1).toLong, r.getSeq[Double](2).toSeq))
          }
        assert(profNow.keySet == batch.keySet, s"batch $i: column sets")
        batch.foreach { case (c, (bp, bq)) =>
          assert(profNow(c) == bp, s"batch $i, col $c: profile half")
          if (bq == null)
            assert(!quantNow.contains(c),
              s"batch $i, col $c: non-numeric column must have no sketch")
          else assert(quantNow(c) == bq,
            s"batch $i, col $c: quantile half ${quantNow.get(c)} vs $bq")
        }
      }
    } finally { q1.stop(); q2.stop() }
  }
}
