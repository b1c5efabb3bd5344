package graft.streaming

import graft.model.{KrmModel, SyncerConfig}
import graft.operators.SyncOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import scala.collection.concurrent.TrieMap

/** The continuous sync pipeline (SURVEY.md §3.2/§3.3) on Structured
  * Streaming: change-event micro-batches are joined against the
  * (re-read-per-batch) rules relation, filtered, projected, scrubbed and
  * merged idempotently into a destination snapshot — the Spark
  * re-expression of the reference's per-event reconcile
  * (/root/reference/syncer/controllers/krmsyncer_controller.go:409-532).
  *
  * Semantics preserved from the reference:
  *   - level-triggered, at-least-once: replaying a micro-batch yields the
  *     same destination state (merge is idempotent; asserted in
  *     SyncStreamSpec);
  *   - tombstones: `op='delete'` events remove the key, NotFound is a
  *     no-op (D1/D9);
  *   - no watermarks/windows needed for parity — every event carries the
  *     full current document, so ordering only matters within a key and
  *     is resolved by the per-batch collapse in [[SyncOps.mergeBatch]].
  */
object SyncStream {

  /** One micro-batch of the sync data plane: events × rules → filters →
    * per-row projection → scrub. Shared by the batch and streaming
    * paths so tests pin identical semantics for both. */
  def plan(events: DataFrame, rules: DataFrame, watcherMode: String): DataFrame = {
    val matched = SyncOps.matchRules(events, rules, watcherMode)
    SyncOps.scrubSystemMetadata(
      SyncOps.filterFieldsPerRow(matched, col("r.syncFields")))
  }

  /** Run the full pipeline in batch mode against a destination snapshot
    * (used by golden-case tests and as the `foreachBatch` body). */
  def applyBatch(events: DataFrame, configs: Seq[SyncerConfig], dest: DataFrame,
      watcherMode: String): DataFrame = {
    val spark = events.sparkSession
    val projected = plan(events, SyncOps.rulesDF(spark, configs), watcherMode)
    SyncOps.mergeBatch(dest, projected)
  }

  /** Start the streaming query: source → plan → `foreachBatch` merge
    * into a parquet destination directory. The rules are re-read from
    * `configProvider` every micro-batch — the streaming analog of the
    * reference listing KRMSyncer CRs per event (controller.go:426-429),
    * so config changes take effect on the next batch without a restart.
    */
  def start(
      spark: SparkSession,
      eventStream: DataFrame,
      configProvider: () => Seq[SyncerConfig],
      destDir: String,
      watcherMode: String,
      checkpointDir: String,
      queryName: String = "krm-sync"): StreamingQuery = {
    eventStream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val configs = configProvider()
        if (configs.nonEmpty) {
          val dest = ParquetDest.read(spark, destDir)
          val merged = SyncStream.applyBatch(batch, configs, dest, watcherMode)
          ParquetDest.overwrite(merged, destDir)
        }
        ()
      }
      .start()
  }
}

/** Destination "cluster" modeled as a parquet snapshot directory with an
  * atomic swap on update. At 100 TB this is a Delta/Iceberg MERGE (the
  * plan in [[SyncOps.mergeBatch]] is exactly a MERGE's matched/not-
  * matched branches); the snapshot-rewrite here is the dependency-free
  * parity implementation, correct because micro-batches are serialized
  * per streaming query.
  */
object ParquetDest {
  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(KrmModel.krmSchema.filterNot(f =>
        KrmModel.scrubCols.contains(f.name) || f.name == "op")))

  def read(spark: SparkSession, dir: String): DataFrame = {
    val f = new java.io.File(dir, "current")
    if (f.exists()) spark.read.parquet(f.getAbsolutePath) else empty(spark)
  }

  def overwrite(df: DataFrame, dir: String): Unit = {
    val tmp = new java.io.File(dir, s"tmp-${System.nanoTime()}")
    df.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    val cur = new java.io.File(dir, "current")
    val old = new java.io.File(dir, s"old-${System.nanoTime()}")
    if (cur.exists()) cur.renameTo(old)
    tmp.renameTo(cur)
    if (old.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(old)
    }
  }
}

/** C6/C10/C11 — the streaming-query registry: one running query per
  * source key (GVK / remote identity), suspend/resume, and a status
  * table. The Spark analog of the reference's WatchedGVKs maps
  * (krmsyncer_controller.go:48-53, 255-276).
  */
final class QueryRegistry {
  import QueryRegistry._
  private val running = TrieMap.empty[String, StreamingQuery]
  private val conditions = TrieMap.empty[String, Condition]

  /** Start-or-reuse: a second rule over the same source key reuses the
    * running query (watch dedup, C6). */
  def startIfAbsent(key: String)(start: () => StreamingQuery): StreamingQuery =
    running.getOrElseUpdate(key, {
      setCondition(key, Condition("Active", "Active", "query running"))
      start()
    })

  /** C10 — suspend: stop the query, mark Suspended, keep registration
    * so resume is a restart. */
  def suspend(key: String): Unit = {
    running.remove(key).foreach(_.stop())
    setCondition(key, Condition("Suspended", "Suspended", "suspend=true"))
  }

  def setCondition(key: String, c: Condition): Unit = { conditions(key) = c; () }
  def condition(key: String): Option[Condition] = conditions.get(key)
  def activeKeys: Set[String] = running.keySet.toSet

  /** C11 — status as a small DataFrame (the status table). */
  def statusTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    conditions.toSeq.map { case (k, c) => (k, c.condType, c.reason, c.message) }
      .toDF("key", "type", "reason", "message")
  }

  def stopAll(): Unit = { running.values.foreach(_.stop()); running.clear() }
}

object QueryRegistry {
  final case class Condition(condType: String, reason: String, message: String)
}
