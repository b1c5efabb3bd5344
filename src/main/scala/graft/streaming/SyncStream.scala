package graft.streaming

import graft.model.{KrmModel, SyncerConfig, WatcherId}
import graft.operators.SyncOps
import graft.functions.functions.json_valid
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import scala.collection.concurrent.TrieMap

/** The continuous sync pipeline (SURVEY.md §3.2/§3.3) on Structured
  * Streaming: change-event micro-batches are joined against the
  * (re-read-per-batch) rules relation, filtered, projected, scrubbed and
  * merged idempotently into *per-syncer destinations* — the Spark
  * re-expression of the reference's per-event reconcile
  * (/root/reference/syncer/controllers/krmsyncer_controller.go:409-532).
  *
  * Semantics preserved from the reference:
  *   - level-triggered, at-least-once: replaying a micro-batch yields the
  *     same destination state (merge is idempotent; asserted in
  *     SyncStreamSpec);
  *   - tombstones: `op='delete'` events remove the key, NotFound is a
  *     no-op (D1/D9);
  *   - destination routing (D8): each syncer resolves its own destination
  *     — push syncs to the syncer's remote cluster, pull syncs local
  *     (controller.go:476-487); two syncers with different remotes write
  *     disjoint destinations (the Active-Passive failover topology,
  *     syncer/README.md:3);
  *   - per-row error tolerance (D14): an event-rule pair whose projected
  *     payload is malformed becomes an error row (controller.go:509-516's
  *     log-and-continue), never poisons its siblings' merge;
  *   - no watermarks/windows needed for parity — every event carries the
  *     full current document, so ordering only matters within a key and
  *     is resolved by the per-batch collapse in [[SyncOps.mergeBatch]].
  */
object SyncStream {

  /** One micro-batch of the sync data plane: events × rules → filters →
    * per-row projection → scrub. Shared by the batch and streaming
    * paths so tests pin identical semantics for both. The output keeps
    * the routing column `destKey` (D8). */
  def plan(events: DataFrame, rules: DataFrame, watcher: WatcherId): DataFrame =
    planWithErrors(events, rules, watcher)._1

  def plan(events: DataFrame, rules: DataFrame, watcherMode: String): DataFrame =
    plan(events, rules, WatcherId(watcherMode))

  /** D14 — the plan plus its error side-output. A matched (event, rule)
    * pair whose rule projects a payload (`spec`/`status`) that is present
    * but not parseable JSON is diverted to the errors relation (identity
    * + syncer + message) and excluded from the merge — the reference's
    * per-event "log error, continue" (controller.go:509-516) as a
    * DataFrame split. Clean siblings of the same batch merge normally.
    */
  def planWithErrors(events: DataFrame, rules: DataFrame,
      watcher: WatcherId): (DataFrame, DataFrame) = {
    val matched = SyncOps.matchRules(events, rules, watcher)
    def payloadBad(p: String): Column =
      (array_contains(col("r.syncFields"), p) ||
        exists(col("r.syncFields"), f => f.startsWith(p + "."))) &&
        col("e." + p).isNotNull && !json_valid(col("e." + p))
    val bad = payloadBad("spec") || payloadBad("status")
    val errors = matched.filter(bad).select(
      col("e.apiGroup").as("apiGroup"), col("e.kind").as("kind"),
      col("e.namespace").as("namespace"), col("e.name").as("name"),
      col("r.syncerName").as("syncerName"),
      concat_ws("; ",
        when(payloadBad("spec"), lit("malformed spec JSON")),
        when(payloadBad("status"), lit("malformed status JSON"))).as("error"))
    val clean = matched.filter(!bad)
    (SyncOps.scrubSystemMetadata(
      SyncOps.filterFieldsPerRow(clean, col("r.syncFields"))), errors)
  }

  /** Run the full pipeline in batch mode against one destination snapshot
    * (all syncers folded together — single-destination deployments and
    * golden-case tests; the `foreachBatch` body uses the routed variant).
    */
  def applyBatch(events: DataFrame, configs: Seq[SyncerConfig], dest: DataFrame,
      watcherMode: String): DataFrame = {
    val spark = events.sparkSession
    val projected = plan(events, SyncOps.rulesDF(spark, configs), WatcherId(watcherMode))
    SyncOps.mergeBatch(dest, projected.drop("destKey"))
  }

  /** D8 — batch apply with per-syncer destination routing: the projected
    * batch is split by each syncer's `destKey` and merged into that
    * destination only. `dests` resolves a destination key to its current
    * snapshot. Returns the merged snapshot per destination key plus the
    * D14 error relation. Destination keys come from the *configs* (a
    * driver-side derivation, no data action): push syncers route to
    * `remote:<namespace>/<secret>`, pull syncers to `local`
    * (controller.go:476-487).
    */
  def applyBatchRouted(events: DataFrame, configs: Seq[SyncerConfig],
      dests: String => DataFrame, watcher: WatcherId): (Map[String, DataFrame], DataFrame) = {
    val spark = events.sparkSession
    val (projected, errors) =
      planWithErrors(events, SyncOps.rulesDF(spark, configs), watcher)
    val merged = destKeys(configs, watcher).map { k =>
      k -> SyncOps.mergeBatch(dests(k),
        projected.filter(col("destKey") === k).drop("destKey"))
    }.toMap
    (merged, errors)
  }

  /** Active destination keys for this watcher, in deterministic order. */
  def destKeys(configs: Seq[SyncerConfig], watcher: WatcherId): Seq[String] =
    configs.filterNot(_.suspend).filter(_.effectiveMode == watcher.mode)
      .map(_.destKey).distinct.sorted

  /** Start the streaming query: source → plan → `foreachBatch`
    * incremental merge into one parquet destination directory *per
    * destination key* (D8). The rules are re-read from `configProvider`
    * every micro-batch — the streaming analog of the reference listing
    * KRMSyncer CRs per event (controller.go:426-429), so config changes
    * take effect on the next batch without a restart. Error rows (D14)
    * are handed to `onErrors` each batch.
    */
  def start(
      spark: SparkSession,
      eventStream: DataFrame,
      configProvider: () => Seq[SyncerConfig],
      destDirFor: String => String,
      watcher: WatcherId,
      checkpointDir: String,
      queryName: String = "krm-sync",
      onErrors: DataFrame => Unit = _ => (),
      numBuckets: Int = 16): StreamingQuery = {
    eventStream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val configs = configProvider()
        if (configs.nonEmpty) {
          val (projected, errors) =
            planWithErrors(batch, SyncOps.rulesDF(spark, configs), watcher)
          // The projection is referenced once per destination — persist it
          // so the scan→join→project stage runs once, not per destination.
          projected.persist()
          try {
            onErrors(errors)
            destKeys(configs, watcher).foreach { k =>
              ParquetDest.mergeIncremental(spark, destDirFor(k),
                projected.filter(col("destKey") === k).drop("destKey"), numBuckets)
            }
          } finally { projected.unpersist(); () }
        }
        ()
      }
      .start()
  }

  /** Single-destination convenience overload (legacy topology): every
    * syncer's output lands in `destDir`, watcher known only by mode. */
  def start(spark: SparkSession, eventStream: DataFrame,
      configProvider: () => Seq[SyncerConfig], destDir: String,
      watcherMode: String, checkpointDir: String): StreamingQuery =
    start(spark, eventStream, configProvider, (_: String) => destDir,
      WatcherId(watcherMode), checkpointDir)
}

/** Destination "cluster" modeled as a parquet snapshot directory,
  * hash-partitioned on the merge key (`current/bucket=N/`). Merges are
  * *partition-scoped*: a micro-batch only reads and rewrites the buckets
  * its keys hash into — O(changed partitions), not O(destination) — the
  * snapshot analog of the reference's per-object SSA patch
  * (krmsyncer_controller.go:586-600). At 100 TB the same plan is a
  * Delta/Iceberg MERGE; the bucket layout here reproduces its
  * file-skipping behavior with plain parquet, and SyncStreamSpec asserts
  * untouched buckets' files are byte-identical after a merge.
  */
object ParquetDest {
  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(KrmModel.krmSchema.filterNot(f =>
        KrmModel.scrubCols.contains(f.name) || f.name == "op")))

  /** Bucket of the merge key — a pure function of the key, so keys only
    * ever interact with their own bucket and a partition-scoped merge is
    * exactly equivalent to a whole-snapshot merge. */
  private def bucketOf(numBuckets: Int): Column =
    pmod(xxhash64(KrmModel.mergeKey.map(col): _*), lit(numBuckets)).cast("int")

  /** True iff the snapshot dir has any data (a fully-tombstoned snapshot
    * leaves an empty `current/` that parquet can't infer a schema from). */
  private def hasData(cur: java.io.File): Boolean =
    cur.exists() && Option(cur.listFiles()).exists(_.exists(f =>
      f.getName.startsWith("bucket=") || f.getName.endsWith(".parquet")))

  def read(spark: SparkSession, dir: String): DataFrame = {
    val f = new java.io.File(dir, "current")
    if (hasData(f)) {
      val df = spark.read.parquet(f.getAbsolutePath)
      if (df.columns.contains("bucket")) df.drop("bucket") else df
    } else empty(spark)
  }

  /** Merge `updates` (a projected, collapsed-per-key micro-batch) into
    * the snapshot at `dir`, rewriting only the buckets that contain
    * updated keys:
    *
    *   1. the touched bucket set comes from the (small) batch itself;
    *   2. only those partitions are scanned from the destination
    *      (partition pruning on the `bucket=` directory column);
    *   3. the merge result is written to a temp dir and swapped in
    *      bucket-by-bucket — a touched bucket whose merged result is
    *      empty (all keys tombstoned) is deleted, untouched buckets are
    *      never listed, read, or written.
    */
  def mergeIncremental(spark: SparkSession, dir: String, updates: DataFrame,
      numBuckets: Int = 16): Unit = {
    val u = updates.withColumn("bucket", bucketOf(numBuckets))
    u.persist()
    try {
      val touched = u.select("bucket").distinct().collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val cur = new java.io.File(dir, "current")
      val destTouched =
        if (hasData(cur))
          spark.read.parquet(cur.getAbsolutePath)
            .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
            .drop("bucket")
        else empty(spark)
      val merged = SyncOps.mergeBatch(destTouched, u.drop("bucket"))
      val tmp = new java.io.File(dir, s"tmp-${System.nanoTime()}")
      merged.withColumn("bucket", bucketOf(numBuckets))
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp.getAbsolutePath)
      if (!cur.exists()) { cur.mkdirs(); () }
      touched.foreach { b =>
        val dst = new java.io.File(cur, s"bucket=$b")
        rm(dst)
        val src = new java.io.File(tmp, s"bucket=$b")
        if (src.exists()) { src.renameTo(dst); () }
      }
      rm(tmp)
    } finally { u.unpersist(); () }
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(); ()
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
