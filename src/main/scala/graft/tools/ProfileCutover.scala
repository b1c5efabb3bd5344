package graft.tools

import graft.Tables
import graft.ops.{IvfIndex, PqIndex, PqRelation, QuantizerRelation}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the large-k quantizer cutover at the scale
  * where it bites (round-12 verdict "next #6"): k = 10⁴ cells over the
  * GenScale sf1 embeddings, trained via [[QuantizerRelation.train]],
  * then corpus-sized assignment and [[IvfIndex.writeIndexed]] timed in
  * BOTH forms — the broadcast-relation join (the ≥-cutover default)
  * and the plan-carried expression (forced via a huge cutover) — plus
  * the carried-column variants that probe the verdict's "What's wrong
  * #1" (assignCells replicates carried payload bytes k times through
  * the in-task blowup before the partial aggregation collapses them).
  * The PQ encode dispatch added this round is measured the same way at
  * a production-shaped m·k′.
  *
  * Output: one `[cutover] <label> <seconds> s (shuffle <MB> MB)` line
  * per measurement, transcribed into SCALING.md.
  *
  * Run: `SPARK_GRAFT_SF_DIR=localdata/sf1 sbt "runMain graft.tools.ProfileCutover"`
  * (localdata/sf1 from `GenScale /root/testdata/sf0.1 localdata/sf1 10`).
  */
object ProfileCutover {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf1")
    val k = sys.env.get("SPARK_GRAFT_CUTOVER_K").map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
        }
      }
    })
    def time[T](label: String)(body: => T): T = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val r = body
      // listener events drain asynchronously — settle before reading
      Thread.sleep(300)
      println(f"[cutover] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"(shuffle ${shuffleBytes.get() / 1e6}%8.2f MB)")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .persist()
    val n = emb.count()
    println(s"[cutover] corpus $sfDir rows=$n k=$k")

    // ---- training at k=10⁴: the relational Lloyd loop
    val cents = time(s"train_relational_k$k") {
      val c = QuantizerRelation.train(emb, "id", "vec", k, iters = 1)
      c.count(); c
    }
    val matrix = time("collect_centroids") {
      QuantizerRelation.collectCentroids(cents)
    }
    val unit = IvfIndex.unitRows(matrix)
    val centsNorm = QuantizerRelation.normalizeRows(
      QuantizerRelation.centroidsDf(spark, matrix)).persist()
    centsNorm.count()

    // ---- corpus-sized assignment, both forms (noop sink: pure
    // assignment cost, no 10⁴-directory write overhead in the number)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (1 to 1).foreach { round =>
      time(s"assign_join_form_r$round") {
        noop(QuantizerRelation.assignCells(emb, "id", "vec", centsNorm))
      }
      time(s"assign_expr_form_r$round") {
        noop(emb.withColumn("cell", IvfIndex.bestCell(col("vec"), matrix)))
      }
    }

    // ---- writeIndexed end-to-end (includes the partitioned write)
    val outJ = graft.Staging.dirFor("cutover-join")
    val outE = graft.Staging.dirFor("cutover-expr")
    time("writeIndexed_join_form") {
      IvfIndex.writeIndexed(emb, matrix, outJ)
    }
    time("writeIndexed_expr_form") {
      IvfIndex.writeIndexed(emb, matrix, outE, cutoverCells = Int.MaxValue)
    }

    // ---- carried-column blowup (verdict "What's wrong #1"): a wide
    // payload rides the k-fold in-task replication of the join form.
    // The "slim" variant projects to (id, vec), assigns, re-joins.
    val wide = emb
      .withColumn("p1", concat_ws("", (1 to 8).map(_ => md5(col("id").cast("string"))): _*))
      .withColumn("p2", concat_ws("", (1 to 8).map(_ => sha1(col("id").cast("string"))): _*))
      .persist()
    wide.count()
    (1 to 1).foreach { round =>
      time(s"assign_join_wide_r$round") {
        noop(QuantizerRelation.assignCells(wide, "id", "vec", centsNorm))
      }
      time(s"assign_slim_rejoin_r$round") {
        val slim = QuantizerRelation.assignCells(
          wide.select(col("id"), col("vec")), "id", "vec", centsNorm)
        noop(wide.drop("vec").join(slim.select(col("id"), col("cell")), Seq("id")))
      }
      time(s"assign_expr_wide_r$round") {
        noop(wide.withColumn("cell", IvfIndex.bestCell(col("vec"), unit.map(identity))))
      }
    }

    // ---- PQ encode dispatch at production shape (this round's form)
    val pq = PqIndex.Codebooks(16, 4, Array.tabulate(16, 1024, 4)((mi, c, j) =>
      (((mi * 947L + c * 131L + j * 31L + 17L) * 2654435761L) % 2000L) / 1000.0 - 1.0))
    val cbDf = PqRelation.codebooksDf(spark, pq).persist()
    cbDf.count()
    (1 to 1).foreach { round =>
      time(s"pq_encode_join_r$round") {
        noop(PqRelation.encodeCells(emb, "id", "vec", cbDf))
      }
      time(s"pq_encode_expr_r$round") {
        noop(emb.withColumn("codes", PqIndex.encode(col("vec"), pq)))
      }
    }
    spark.stop()
  }
}
