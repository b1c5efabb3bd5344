package graft.queries

import graft.Tables
import graft.model.{ResourceRule, SyncerConfig}
import graft.operators.{ExportOps, SyncOps}
import graft.ops.{Dedup, IvfIndex, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared query surface (SURVEY.md §2 inventory + §7.2.8
  * extensions): every entry pairs a Spark implementation with (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  *
  * Conventions for oracle hash-parity:
  *   - every computed column aliased identically on both sides;
  *   - deterministic total ORDER BY on both sides;
  *   - double aggregates rounded (floating-point sum order differs
  *     between engines; rounding collapses ULP noise);
  *   - timestamps surfaced as epoch seconds or dates, not raw
  *     timestamps.
  */
object QueryCatalog {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- //
  // Relational core: scans, filters, aggregations, joins, windows     //
  // ---------------------------------------------------------------- //

  /** TPC-H Q1-style pricing summary — the headline aggregation. */
  val q1Agg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: dimension filter + join + top-k. Customer scales
    * WITH the fact tables (TPC-H grows it with SF), so it carries no
    * broadcast hint — at gate SFs AQE broadcasts the filtered side on
    * its own; at 100× a forced hint would OOM the driver where a
    * shuffle join is the right plan. */
  val q3TopOrders: Q = (s, dir) => {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("o_orderdate").cast("date").cast("string").as("orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }
  val q3TopOrdersSql: String =
    """SELECT l_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
      |  o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style multi-join star aggregation (region→nation→customer
    * →orders→lineitem→supplier). Broadcast hints ONLY on the
    * fixed-cardinality dims (region = 5 rows, nation = 25 rows — size
    * independent of SF). Customer and supplier scale with SF, so they
    * are unhinted: AQE broadcasts them at gate SFs where they're
    * kilobytes, and falls back to a shuffle join at the 100× design
    * point where a forced broadcast would fail. */
  val q5RegionRevenue: Q = (s, dir) => {
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }
  val q5RegionRevenueSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q7-style cross-nation trade volume: lineitems where the
    * supplier and the ordering customer sit in DIFFERENT nations,
    * rolled up by (supp_nation, cust_nation, ship year). The join
    * graph is the largest in the relational core — lineitem against
    * orders/customer/supplier with BOTH nation sides broadcast (dims
    * stay out of the shuffle; only the three fact-side hash joins
    * exchange, and the cross-nation inequality applies before the
    * dimension joins so mismatched rows never reach them). */
  val q7VolumeShipping: Q = (s, dir) => {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      // Integer-exact volume (the q_anomaly discipline): the per-row
      // product is ONE double expression — bit-identical in any
      // engine — so rounding it to integer 10⁻⁴-dollars per row and
      // summing longs is exact and summation-order-free (a double SUM
      // over 4k+ groups disagrees in the 2nd decimal for a handful —
      // engines sum in different orders). The closing /10000.0 is one
      // long→double division, bit-identical too; no decimal re-round,
      // whose half-up-on-decimal vs half-away-on-binary semantics
      // diverge at x.xx50 boundaries.
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")) / 10000.0).as("volume"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }
  val q7VolumeShippingSql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS volume,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE s_nationkey <> c_nationkey
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Window function: top-3 orders per customer by total price. */
  val qWindowTopOrders: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }
  val qWindowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Event-time tumbling-window aggregation (streaming-shaped, batch
    * executed; the Structured Streaming twin lives in graft.streaming). */
  val qEventsHourly: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(Tables.tsHourEpoch(col("ts")).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour_epoch"), col("event_type"))
  }
  val qEventsHourlySql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_epoch, event_type""".stripMargin

  // ---------------------------------------------------------------- //
  // KRM operator analogs (SURVEY §2.1 / §2.3) over the harness tables //
  // ---------------------------------------------------------------- //

  /** B3 — capability predicate (verbs array membership). Verbs are
    * synthesized deterministically so both engines see the same data. */
  val b3VerbFilter: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
      .withColumn("verbs",
        when(col("doc_id") % 3 === 0, "get,list,watch").otherwise("get,watch"))
    ExportOps.verbFilter(d, col("verbs"), "list")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }
  val b3VerbFilterSql: String =
    """SELECT doc_id, source
      |FROM (SELECT doc_id, source,
      |        CASE WHEN doc_id % 3 = 0 THEN 'get,list,watch' ELSE 'get,watch' END AS verbs
      |      FROM documents) t
      |WHERE list_contains(string_split(verbs, ','), 'list')
      |ORDER BY doc_id""".stripMargin

  /** B4 — subresource filter (drop names containing '/'). */
  val b4SubresourceFilter: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
      .withColumn("res_name",
        when(col("doc_id") % 5 === 0, concat(col("source"), lit("/status")))
          .otherwise(col("source")))
    ExportOps.subresourceFilter(d, col("res_name"))
      .select(col("doc_id"), col("res_name"))
      .orderBy(col("doc_id"))
  }
  val b4SubresourceFilterSql: String =
    """SELECT doc_id, res_name
      |FROM (SELECT doc_id,
      |        CASE WHEN doc_id % 5 = 0 THEN source || '/status' ELSE source END AS res_name
      |      FROM documents) t
      |WHERE NOT contains(res_name, '/')
      |ORDER BY doc_id""".stripMargin

  /** B6+B7 — defaulting projection and path derivation. */
  val b7PathDerivation: Q = (s, dir) => {
    val e = Tables.events(s, dir)
      .withColumn("ns", when(col("event_id") % 4 === 0, lit("")).otherwise(col("event_type")))
      .withColumn("grp", when(col("event_id") % 7 === 0, lit("")).otherwise(lit("apps")))
    e.select(col("event_id"),
        ExportOps.krmPath(col("ns"), col("grp"), lit("Event"),
          concat(lit("ev-"), col("event_id"))).as("path"))
      .orderBy(col("event_id"))
  }
  val b7PathDerivationSql: String =
    """SELECT event_id,
      |  concat_ws('/',
      |    CASE WHEN event_id % 4 = 0 THEN '_cluster' ELSE event_type END,
      |    CASE WHEN event_id % 7 = 0 THEN 'core' ELSE 'apps' END,
      |    'Event', 'ev-' || event_id || '.yaml') AS path
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** B8 — canonical JSON serialization of a projected document. */
  val b8Serialize: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(col("event_id"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("type"))).as("doc"))
      .orderBy(col("event_id"))
  }
  val b8SerializeSql: String =
    """SELECT event_id,
      |  to_json(struct_pack(id := event_id, type := event_type)) AS doc
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** B9+B10 — archive sink + custom DSv2 source, oracle-gated end to
    * end: documents are rendered to (path, json), written as a sharded
    * zip export by [[graft.sinks.ZipSink]], read back through the
    * `graft-zip` DataSource V2 ([[graft.sources.ZipDataSource]]), and
    * the oracle recomputes every (path, md5(json)) straight from the
    * table — any loss or corruption in the sink or source breaks the
    * hash. */
  val b10ZipRoundtrip: Q = (s, dir) => {
    val entries = Tables.documents(s, dir).select(
      concat(lit("docs/"), col("doc_id").cast("string"), lit(".json")).as("path"),
      to_json(struct(col("doc_id"), col("source"))).as("data"))
    val out = graft.Staging.dirFor("zip-rt")
    graft.sinks.ZipSink.writeSharded(entries, out)
    s.read.format("graft-zip").load(out)
      .select(col("path"), md5(col("data")).as("data_md5"))
      .orderBy(col("path"))
  }
  val b10ZipRoundtripSql: String =
    """SELECT concat('docs/', doc_id, '.json') AS path,
      |  md5(to_json(struct_pack(doc_id := doc_id, source := source))) AS data_md5
      |FROM documents
      |ORDER BY path""".stripMargin

  /** D2+D3+D7 — broadcast rules join with suspend + membership filters.
    * Rules are a tiny inline relation on both sides. */
  val d2RulesJoin: Q = (s, dir) => {
    import s.implicits._
    val rules = Seq(
      (1, "purchase", false, "billing"),
      (2, "signup", false, "onboarding"),
      (3, "error", true, "alerting"),   // suspended — must not match
      (4, "purchase", false, "audit"))  // second match for purchases
      .toDF("rule_id", "match_type", "suspend", "dest")
    Tables.events(s, dir).join(broadcast(rules),
        col("event_type") === col("match_type") && !col("suspend"))
      .groupBy(col("rule_id"), col("dest"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("rule_id"))
  }
  val d2RulesJoinSql: String =
    """WITH rules(rule_id, match_type, suspend, dest) AS (VALUES
      |  (1, 'purchase', false, 'billing'),
      |  (2, 'signup', false, 'onboarding'),
      |  (3, 'error', true, 'alerting'),
      |  (4, 'purchase', false, 'audit'))
      |SELECT rule_id, dest, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events JOIN rules ON event_type = match_type AND NOT suspend
      |GROUP BY rule_id, dest
      |ORDER BY rule_id""".stripMargin

  /** D6 — GVK match incl. glob suffix-match (source column as "group"). */
  val d6GlobMatch: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    d.filter(SyncOps.gvkMatch(
        evGroup = concat(col("source"), lit(".cnrm.cloud.google.com")),
        evVersion = lit("v1"), evKind = lit("Doc"),
        rGroup = lit("*.cnrm.cloud.google.com"), rVersion = lit("*"), rKind = lit("*")) ||
        SyncOps.gvkMatch(
          evGroup = col("source"), evVersion = lit("v1"), evKind = lit("Doc"),
          rGroup = lit("src1"), rVersion = lit("v1"), rKind = lit("Doc")))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }
  // Every row's synthesized group ends with the KCC suffix, so the glob
  // matches all rows; the exact-match arm is the semantics witness.
  val d6GlobMatchSql: String =
    """SELECT doc_id, source FROM documents
      |WHERE ends_with(source || '.cnrm.cloud.google.com', 'cnrm.cloud.google.com')
      |   OR source = 'src1'
      |ORDER BY doc_id""".stripMargin

  /** D7 — namespace membership with the empty-list-matches-all rule. */
  val d7NamespaceFilter: Q = (s, dir) => {
    import s.implicits._
    val rules = Seq(
      (1, Seq("click", "view")),
      (2, Seq.empty[String]))
      .toDF("rule_id", "namespaces")
    Tables.events(s, dir).join(broadcast(rules),
        SyncOps.namespaceMatch(col("event_type"), col("namespaces")))
      .groupBy(col("rule_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("rule_id"))
  }
  val d7NamespaceFilterSql: String =
    """WITH rules(rule_id, namespaces) AS (VALUES
      |  (1, ['click', 'view']),
      |  (2, CAST([] AS VARCHAR[])))
      |SELECT rule_id, count(*) AS n
      |FROM events JOIN rules ON len(namespaces) = 0 OR list_contains(namespaces, event_type)
      |GROUP BY rule_id
      |ORDER BY rule_id""".stripMargin

  /** D10 — dynamic nested-field extraction from a JSON payload column. */
  val d10JsonProjection: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(col("event_id"), get_json_object(col("props"), "$.k").as("k_val"))
      .orderBy(col("event_id"))
  }
  val d10JsonProjectionSql: String =
    """SELECT event_id, json_extract_string(props, '$.k') AS k_val
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** D11 — system-metadata scrub: identity + payload survive, system
    * columns (ts/user_id/props here) are dropped by projection. */
  val d11Scrub: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), round(col("value"), 4).as("value"))
      .orderBy(col("event_id"))
  }
  val d11ScrubSql: String =
    """SELECT event_id, event_type, round(value, 4) AS value
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** D1+D9+D12 — CDC last-state semantics in batch: latest event per
    * key wins; keys whose latest op is a tombstone disappear. */
  val d12CdcLastState: Q = (s, dir) => {
    val e = Tables.events(s, dir)
      .withColumn("op", when(col("event_type") === "error", "delete").otherwise("upsert"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"))
      .orderBy(col("user_id"))
  }
  val d12CdcLastStateSql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type
      |FROM (
      |  SELECT *, CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 AND op <> 'delete'
      |ORDER BY user_id""".stripMargin

  /** D1 for snapshot-only sources — [[SyncOps.snapshotDiff]] oracle-gated:
    * two full "snapshots" are derived deterministically from documents
    * (prev = doc_id % 5 ≠ 0; curr = doc_id % 3 ≠ 0 with the payload of
    * every doc_id % 4 = 0 row changed), so the diff must emit exactly
    * the inserts, payload-changes, and synthesized tombstones that
    * DuckDB's full-outer-join formulation finds — and drop unchanged
    * keys. Payloads are md5(text) strings: engine-portable, no JSON
    * escaping concerns. */
  val d1SnapshotDiff: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    def krm(df: DataFrame, spec: Column): DataFrame =
      df.select(lit("g").as("apiGroup"), lit("v1").as("apiVersion"),
        lit("Doc").as("kind"), lit("default").as("namespace"),
        concat(lit("doc-"), col("doc_id")).as("name"),
        lit(null).cast("map<string,string>").as("labels"),
        lit(null).cast("map<string,string>").as("annotations"),
        spec.as("spec"), lit(null).cast("string").as("status"))
    val prev = krm(docs.filter(col("doc_id") % 5 =!= 0), md5(col("text")))
    val curr = krm(docs.filter(col("doc_id") % 3 =!= 0),
      when(col("doc_id") % 4 === 0, concat(md5(col("text")), lit("v2")))
        .otherwise(md5(col("text"))))
    SyncOps.snapshotDiff(prev, curr)
      .select(col("name"), col("op"), col("spec"))
      .orderBy(col("name"))
  }
  val d1SnapshotDiffSql: String =
    """WITH prev AS (
      |  SELECT 'doc-' || doc_id AS name, md5(text) AS spec
      |  FROM documents WHERE doc_id % 5 <> 0),
      |curr AS (
      |  SELECT 'doc-' || doc_id AS name,
      |    CASE WHEN doc_id % 4 = 0 THEN md5(text) || 'v2' ELSE md5(text) END AS spec
      |  FROM documents WHERE doc_id % 3 <> 0)
      |SELECT coalesce(c.name, p.name) AS name,
      |  CASE WHEN c.name IS NULL THEN 'delete' ELSE 'upsert' END AS op,
      |  c.spec AS spec
      |FROM prev p FULL OUTER JOIN curr c ON p.name = c.name
      |WHERE c.name IS NULL OR p.name IS NULL OR p.spec IS DISTINCT FROM c.spec
      |ORDER BY name""".stripMargin

  /** The composed sync data plane (D2→D7 filters + D10 projection) as
    * one oracle-checked query: events-as-KRM-documents matched against
    * two rules, payload projected per rule. */
  val syncPipelineFiltered: Q = (s, dir) => {
    import s.implicits._
    val rules = Seq(
      ("sync-purchases", "pull", false, "purchase", Seq.empty[String]),
      ("sync-clicks", "pull", false, "click", Seq("click")),
      ("push-views", "push", false, "view", Seq.empty[String]))
      .toDF("syncer", "mode", "suspend", "kind_match", "namespaces")
    Tables.events(s, dir)
      .join(broadcast(rules),
        !col("suspend") && col("mode") === "pull" &&
          col("event_type") === col("kind_match") &&
          SyncOps.namespaceMatch(col("event_type"), col("namespaces")))
      .select(col("syncer"), col("event_id"),
        get_json_object(col("props"), "$.k").as("k_val"))
      .orderBy(col("syncer"), col("event_id"))
  }
  val syncPipelineFilteredSql: String =
    """WITH rules(syncer, mode, suspend, kind_match, namespaces) AS (VALUES
      |  ('sync-purchases', 'pull', false, 'purchase', CAST([] AS VARCHAR[])),
      |  ('sync-clicks', 'pull', false, 'click', ['click']),
      |  ('push-views', 'push', false, 'view', CAST([] AS VARCHAR[])))
      |SELECT syncer, event_id, json_extract_string(props, '$.k') AS k_val
      |FROM events JOIN rules ON NOT suspend AND mode = 'pull'
      |  AND event_type = kind_match
      |  AND (len(namespaces) = 0 OR list_contains(namespaces, event_type))
      |ORDER BY syncer, event_id""".stripMargin

  // ---------------------------------------------------------------- //
  // LLM-pipeline extensions: dedup, similarity, text, multimodal      //
  // ---------------------------------------------------------------- //

  /** Exact dedup groups by content digest. */
  val dedupExact: Q = (s, dir) => {
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("fp"))
  }
  val dedupExactSql: String =
    """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY fp""".stripMargin

  /** Exact n-gram Jaccard near-dup: top-20 most similar pairs. */
  val dedupJaccardTop: Q = (s, dir) => {
    Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", n = 3)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
      .limit(20)
  }
  val dedupJaccardTopSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id,
      |      CASE WHEN len(t) >= 3
      |        THEN unnest(list_transform(range(1, len(t) - 1),
      |               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |        ELSE unnest([array_to_string(t, ' ')]) END AS sh
      |    FROM toks)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT id1, id2,
      |  round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS jaccard
      |FROM inter
      |JOIN sizes s1 ON s1.doc_id = id1
      |JOIN sizes s2 ON s2.doc_id = id2
      |ORDER BY jaccard DESC, id1, id2
      |LIMIT 20""".stripMargin

  /** MinHash+LSH near-dup pairs, oracle-gated: at (bands=32, rows=2) a
    * pair with Jaccard j is missed with probability (1-j²)³² ≤ 1e-4 at
    * the 0.5 threshold — vanishing for the corpus's actual near-dup
    * pairs — so the LSH output equals the brute-force "all pairs with
    * exact n-gram Jaccard ≥ 0.5" relation that DuckDB computes
    * independently. Verification inside the pipeline is already exact
    * Jaccard; banding only gates candidate generation. Recall across
    * thresholds/bandings is asserted separately in DedupSpec.
    */
  val dedupMinhashLsh: Q = (s, dir) => {
    Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
  }
  val dedupMinhashLshSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id,
      |      CASE WHEN len(t) >= 3
      |        THEN unnest(list_transform(range(1, len(t) - 1),
      |               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |        ELSE unnest([array_to_string(t, ' ')]) END AS sh
      |    FROM toks)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT id1, id2,
      |  round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS jaccard
      |FROM inter
      |JOIN sizes s1 ON s1.doc_id = id1
      |JOIN sizes s2 ON s2.doc_id = id2
      |WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5
      |ORDER BY jaccard DESC, id1, id2""".stripMargin

  /** Incremental ingestion dedup ([[Dedup.bandIndex]] +
    * [[Dedup.newVsCorpusPairs]]): the corpus (doc_id % 5 ≠ 0) is
    * band-indexed ONCE to staging parquet; the "day's batch"
    * (doc_id % 5 = 0) is then shingled, probed against the index, and
    * verified — the corpus is never re-hashed, and its text is re-read
    * only for the broadcast-pruned candidate ids. Same signature
    * config as `dedup_minhash_lsh` (64 hashes / 32 bands, whose 100%
    * candidate recall at ≥0.5 this corpus already hash-proves), so the
    * oracle is the exact cross-split Jaccard join. */
  val dedupIncremental: Q = (s, dir) => {
    val idxDir = graft.Staging.dirFor("inc-dedup-index")
    Dedup.bandIndex(Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", numHashes = 64, bands = 32)
      .write.mode("overwrite").parquet(idxDir)
    Dedup.newVsCorpusPairs(
        Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0),
        s.read.parquet(idxDir),
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0),
        "doc_id", "text", numHashes = 64, bands = 32, threshold = 0.5)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
  }
  val dedupIncrementalSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id,
      |      CASE WHEN len(t) >= 3
      |        THEN unnest(list_transform(range(1, len(t) - 1),
      |               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |        ELSE unnest([array_to_string(t, ' ')]) END AS sh
      |    FROM toks)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
      |  FROM sh a JOIN sh b ON a.sh = b.sh
      |  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT id1, id2,
      |  round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 4) AS jaccard
      |FROM inter
      |JOIN sizes s1 ON s1.doc_id = id1
      |JOIN sizes s2 ON s2.doc_id = id2
      |WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.5
      |ORDER BY jaccard DESC, id1, id2""".stripMargin

  /** SimHash signatures, oracle-gated via the engine-portable md5-based
    * 60-bit token hash ([[Dedup.md5TokenHash60]]): DuckDB recomputes the
    * exact signatures (distinct tokens → per-bit ±1 sums → sign
    * recombination). The xxhash64/64-bit production variant is
    * value-asserted against [[Dedup.simhash]] in DedupSpec.
    */
  val dedupSimhash: Q = (s, dir) => {
    Dedup.simhashSignatures(Tables.documents(s, dir), "doc_id", "text",
        tokenHash = Dedup.md5TokenHash60, bits = 60)
      .toDF("doc_id", "simhash")
      .orderBy(col("doc_id"))
  }
  /** The 60-bit md5 simhash signature chain as a reusable CTE body:
    * `${p}sigs(doc_id, sig)` over `documents$where` — shared by
    * [[dedupSimhashSql]] (whole corpus) and the `dedup_simhash_inc`
    * oracle (one chain per split). 16^k factors are exact longs
    * (16^14 = 2^56), so the hex-digit recombination never leaves
    * integer arithmetic. */
  private[queries] def simhashSigsCtes(p: String, where: String): String = {
    val hexVal = Md5Sql.hexVal
    val sums = (0 until 60).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS c$j").mkString(", ")
    val recomb = (0 until 60).map(j =>
      s"(CASE WHEN c$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""${p}toks AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents$where)),
       |${p}hashed AS (
       |  SELECT doc_id, ($hexVal) AS h
       |  FROM (SELECT doc_id, substring(md5(tok), 1, 15) AS h15 FROM ${p}toks)),
       |${p}counts AS (SELECT doc_id, $sums FROM ${p}hashed GROUP BY doc_id),
       |${p}sigs AS (SELECT doc_id, CAST($recomb AS BIGINT) AS sig FROM ${p}counts)""".stripMargin
  }

  val dedupSimhashSql: String =
    s"""WITH ${simhashSigsCtes("", "")}
       |SELECT doc_id, sig AS simhash FROM sigs ORDER BY doc_id""".stripMargin

  /** Embedding near-dup pairs: blocked cosine ≥ 0.35 (the synthetic
    * embeddings carry no true dups; the threshold sits inside the
    * observed within-label similarity range so the operator produces
    * checkable output). */
  val dedupEmbeddingCos: Q = (s, dir) => {
    Similarity.cosineDupPairs(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label", threshold = 0.35)
      .select(col("id1"), col("id2"), round(col("cos"), 4).as("cos"))
      .orderBy(col("id1"), col("id2"))
  }
  val dedupEmbeddingCosSql: String =
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  round(
      |    list_dot_product(a.emb, b.emb) /
      |    (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 4) AS cos
      |FROM (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings) a
      |JOIN (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings) b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_dot_product(a.emb, b.emb) /
      |      (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) >= 0.35
      |ORDER BY id1, id2""".stripMargin

  /** Seeded deterministic quantizer for the SemDeDup gate query: 16
    * Gaussian centroids (seed 7) instead of trained k-means, so the
    * DuckDB oracle can replay the cell assignment from embedded
    * literals — production trains centroids with [[IvfIndex.train]],
    * which an independent oracle cannot replay. Same seeding pattern
    * as [[annLshSql]]'s hyperplanes. */
  private[queries] val semanticCentroids: Array[Array[Double]] =
    Similarity.hyperplanes(dim = 64, numBits = 16, seed = 7L)

  /** SemDeDup drop list: cell-scoped cosine near-dup collapse (the
    * cluster-conditional quadratic search — see
    * [[Dedup.semanticDropList]] for the 100 TB sizing argument). */
  val dedupSemantic: Q = (s, dir) => {
    Dedup.semanticDropList(Tables.embeddings(s, dir), "vec_id", "embedding",
        semanticCentroids, threshold = 0.35)
      .select(col("cell"), col("dropped_id"), col("exemplar_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("dropped_id"))
  }

  /** DuckDB replay of [[dedupSemantic]]: the UNIT-NORMALIZED centroid
    * rows (exactly the doubles [[IvfIndex.bestCell]] dots against —
    * `Double.toString` round-trips through DuckDB's decimal parse) are
    * embedded as literals; argmax-with-ties-to-LARGER-index is
    * replayed as `len(s) - list_position(list_reverse(s), list_max(s))`
    * (first position in the reversed score list = last max in the
    * original, matching BestCellExpr's `>=` update rule). */
  /** Shared oracle prefix: the seeded-quantizer cell assignment CTE
    * (`cells(vec_id, v, cell)`), used by both semantic-dedup oracles. */
  private def semanticCellsCte: String = {
    val cs = IvfIndex.unitRows(semanticCentroids)
    val csLit = cs.map(_.mkString("[", ", ", "]"))
      .mkString("[", ",\n      ", "]")
    s"""WITH cents AS (SELECT $csLit AS cs),
       |base AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cells AS (
       |  SELECT vec_id, v,
       |    len(s) - list_position(list_reverse(s), list_max(s)) AS cell
       |  FROM (SELECT vec_id, v,
       |          list_transform(cs, c -> list_dot_product(v, c)) AS s
       |        FROM base CROSS JOIN cents))""".stripMargin
  }

  val dedupSemanticSql: String =
    s"""$semanticCellsCte,
       |hits AS (
       |  SELECT a.cell AS cell, a.vec_id AS id1, b.vec_id AS id2,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35)
       |SELECT cell, id2 AS dropped_id, min(id1) AS exemplar_id,
       |  round(min_by(cos, id1), 4) AS cos
       |FROM hits GROUP BY cell, id2
       |ORDER BY dropped_id""".stripMargin

  /** Incremental SemDeDup ([[Dedup.semanticProbe]]): new batch
    * (vec_id % 5 = 0, the [[dedupIncremental]] split convention)
    * probed against a cell-partitioned index of the rest — index
    * write included in the timed query, probe scan partition-pruned
    * to the batch's cells (plan-gated in SemanticDedupSpec). */
  val dedupSemanticIncremental: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val corpus = emb.filter(col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val path = graft.Staging.dirFor("semantic-index")
    IvfIndex.writeIndexed(corpus, semanticCentroids, path)
    Dedup.semanticProbe(s, path, batch, "vec_id", "embedding",
        semanticCentroids, threshold = 0.35)
      .select(col("cell"), col("new_id"), col("exemplar_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("new_id"))
  }

  val dedupSemanticIncrementalSql: String =
    s"""$semanticCellsCte,
       |hits AS (
       |  SELECT a.cell AS cell, a.vec_id AS id1, b.vec_id AS id2,
       |    list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
       |  FROM cells a JOIN cells b ON a.cell = b.cell
       |  WHERE a.vec_id % 5 <> 0 AND b.vec_id % 5 = 0
       |    AND list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35)
       |SELECT cell, id2 AS new_id, min(id1) AS exemplar_id,
       |  round(min_by(cos, id1), 4) AS cos
       |FROM hits GROUP BY cell, id2
       |ORDER BY new_id""".stripMargin

  /** Brute-force cosine top-k ANN (exact baseline): 5 query vectors,
    * k=10 neighbors each (self excluded). */
  val annTopK: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select(col("qid"), col("id"), round(col("score"), 4).as("score"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }
  /** Shared oracle CTEs: the standing queries (vec_id < 5) and corpus
    * (vec_id ≥ 5) split — used by [[annTopKSql]], [[annLshSql]], and
    * the retrieval-eval oracle, which composes both rankings. */
  private[queries] val annQcCtes: String =
    """q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
      |      FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      |      FROM embeddings WHERE vec_id >= 5)""".stripMargin

  /** Exact brute-force ranking chain over [[annQcCtes]], ending in
    * `gtscored(qid, id, raw, rank)`. */
  private[queries] val annGtScoredCte: String =
    """gtscored AS (
      |  SELECT qid, id,
      |    list_dot_product(qvec, vec) /
      |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) AS raw,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_dot_product(qvec, vec) /
      |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) DESC, id) AS rank
      |  FROM c CROSS JOIN q)""".stripMargin

  val annTopKSql: String =
    s"""WITH $annQcCtes,
       |$annGtScoredCte
       |SELECT qid, id, round(raw, 4) AS score, rank
       |FROM gtscored WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin

  /** DuckDB oracle for [[annLsh]]: the sign-random-projection planes are
    * deterministic constants (seed 42), so the oracle SQL embeds the
    * same 64 hyperplanes as list literals and recomputes bucketing →
    * candidate join → exact cosine re-rank independently. A sign
    * disagreement would need |v·p| inside double rounding error —
    * checked green at both gate scales.
    */
  /** The seed-42 LSH bucketing → candidate join → exact cosine re-rank
    * chain over [[annQcCtes]], ending in `lshscored(qid, id, raw,
    * rank)` — shared by [[annLshSql]] and the retrieval-eval oracle. */
  private[queries] val annLshScoredCtes: String = {
    val planes = Similarity.hyperplanes(dim = 64, numBits = 64, seed = 42L)
    val planesLit = planes.map(p => p.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val buckets = (0 until 16).map { t =>
      val bitExprs = (t * 4 until (t + 1) * 4).map(i => s"bits[${i + 1}]").mkString(" || ")
      s"'${t}_' || $bitExprs"
    }.mkString(",\n      |    ")
    s"""planes AS (SELECT $planesLit AS pl),
       |qbits AS (
       |  SELECT qid, list_transform(pl, p ->
       |    CASE WHEN list_dot_product(qvec, p) > 0 THEN '1' ELSE '0' END) AS bits
       |  FROM q CROSS JOIN planes),
       |cbits AS (
       |  SELECT id, list_transform(pl, p ->
       |    CASE WHEN list_dot_product(vec, p) > 0 THEN '1' ELSE '0' END) AS bits
       |  FROM c CROSS JOIN planes),
       |qb AS (SELECT qid, unnest([
       |    $buckets]) AS bucket FROM qbits),
       |cb AS (SELECT id, unnest([
       |    $buckets]) AS bucket FROM cbits),
       |cands AS (SELECT DISTINCT qid, id FROM qb JOIN cb USING (bucket)),
       |lshscored AS (
       |  SELECT cands.qid, cands.id,
       |    list_dot_product(qvec, vec) /
       |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) AS raw,
       |    row_number() OVER (PARTITION BY cands.qid ORDER BY
       |      list_dot_product(qvec, vec) /
       |      (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(vec, vec))) DESC,
       |      cands.id) AS rank
       |  FROM cands JOIN q ON q.qid = cands.qid JOIN c ON c.id = cands.id)""".stripMargin
  }

  val annLshSql: String =
    s"""WITH $annQcCtes,
       |$annLshScoredCtes
       |SELECT qid, id, round(raw, 4) AS score, rank
       |FROM lshscored WHERE rank <= 10
       |ORDER BY qid, rank""".stripMargin

  /** LSH-bucketed ANN, oracle-gated (see [[annLshSql]]); recall vs the
    * exact baseline across parameters is asserted in SimilaritySpec. */
  val annLsh: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    // Coarse buckets (4 bits × 16 tables): tuned to this corpus's weak
    // neighbor similarities (cos ≈ 0.3-0.5); see SimilaritySpec.
    Similarity.lshTopK(queries, corpus, k = 10, dim = 64,
      bitsPerTable = 4, tables = 16)
      .select(col("qid"), col("id"), round(col("score"), 4).as("score"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Per-class audit of the TRAINED classifier against the committed
    * LABELED corpus (`fixtures/labeled_quality.parquet`,
    * [[graft.tools.GenQualityFixtures]]) — the added-information claim
    * as a DECLARED, oracle-checked relation: for each generative class,
    * how many docs the learned model classifies correctly vs how many
    * the stopword rule does. The adversarial classes (g_terse,
    * b_stuffed, b_repeat) show rule_correct = 0 with model_correct ≈
    * n_docs — information a scan-speed filter cannot have. Everything
    * is integer-exact: the model verdict is the BIGINT weight sum's
    * sign, the rule verdict the integer form `stopword_hits·16 ≥
    * n_tokens` (⇔ ratio ≥ 1/16 = 0.0625, no double division). */
  val textQualityAudit: Q = (s, dir) => {
    val docs = s.read.parquet(
      s"${graft.Tables.fixturesDir}/labeled_quality.parquet")
    val scored = TextAnalysis.classifierScoreInline(docs, "doc_id", "text",
        TextAnalysis.trainedWeightArray(s))
      .select(col("id").as("doc_id"), col("keep"))
    val ts = TextAnalysis.tokenStats(col("text"))
    val rule = docs.select(col("doc_id"),
      (ts.getField("stopword_hits") * 16 >= ts.getField("n_tokens"))
        .as("rule_keep"))
    docs.select(col("doc_id"), col("klass"), col("label"))
      .join(scored, Seq("doc_id")).join(rule, Seq("doc_id"))
      .groupBy(col("klass"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("label")).as("label"),
        sum(when(col("keep") === (col("label") === 1), 1L).otherwise(0L))
          .as("model_correct"),
        sum(when(col("rule_keep") === (col("label") === 1), 1L).otherwise(0L))
          .as("rule_correct"))
      .orderBy(col("klass"))
  }

  /** DuckDB replay of [[textQualityAudit]] (a `def` — fixture paths
    * resolve at dump time): the classifier replay is the
    * [[textQualityClassifierSql]] md5-bucket JOIN against the committed
    * weights; the rule replay is the [[textStatsSql]] stopword filter in
    * integer form. Both verdicts compare as booleans against the
    * fixture's ground-truth label. */
  def textQualityAuditSql: String = {
    val hexVal = Md5Sql.hexVal
    val stops = TextAnalysis.defaultStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT * FROM '${graft.Tables.fixturesDir}/labeled_quality.parquet'),
       |toks AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM docs),
       |hashed AS (
       |  SELECT doc_id, ($hexVal) AS h
       |  FROM (SELECT doc_id, substring(md5(tok), 1, 15) AS h15 FROM toks)),
       |scored AS (
       |  SELECT doc_id, CAST(sum(w.iw) AS BIGINT) AS raw
       |  FROM hashed
       |  JOIN '${graft.Tables.fixturesDir}/classifier_weights.parquet' w
       |    ON (h % 1024) = w.bucket
       |  GROUP BY doc_id),
       |rule AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split_regex(text, '\\s+'),
       |      t -> list_contains([$stops], t))) AS hits,
       |    len(string_split_regex(text, '\\s+')) AS n
       |  FROM docs)
       |SELECT klass, count(*) AS n_docs, max(label) AS label,
       |  CAST(sum(CASE WHEN (raw > 0) = (label = 1) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS model_correct,
       |  CAST(sum(CASE WHEN (hits * 16 >= n) = (label = 1) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS rule_correct
       |FROM docs JOIN scored USING (doc_id) JOIN rule USING (doc_id)
       |GROUP BY klass ORDER BY klass""".stripMargin
  }

  /** Text statistics: token counts + quality signals, all codegen'd. */
  val textStats: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_c"),
        round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"),
        round(TextAnalysis.meanTokenLen(col("text")), 4).as("mean_token_len"))
      .orderBy(col("doc_id"))
  }
  val textStatsSql: String = {
    val stops = TextAnalysis.defaultStopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  len(string_split_regex(text, '\\s+')) AS n_tokens,
       |  length(text) AS n_chars_c,
       |  round(CAST(len(list_filter(string_split_regex(text, '\\s+'),
       |      t -> list_contains([$stops], t))) AS DOUBLE)
       |    / len(string_split_regex(text, '\\s+')), 4) AS stopword_ratio,
       |  round(CAST(list_sum(list_transform(string_split_regex(text, '\\s+'),
       |      t -> length(t))) AS DOUBLE)
       |    / len(string_split_regex(text, '\\s+')), 4) AS mean_token_len
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprints: md5 (oracle-checkable) — the codegen'd
    * rolling-hash variant is asserted in TextAnalysisSpec. */
  val textFingerprint: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }
  val textFingerprintSql: String =
    """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id""".stripMargin

  /** Language ID — the marker-count heuristic is plain SQL: per-language
    * hits over lowercased tokens, argmax with ties resolved to the
    * largest language code (the `array_max(struct(hits, lang))`
    * semantics of the expression). */
  val textLangId: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))
  }
  val textLangIdSql: String =
    """WITH lt AS (
      |  SELECT doc_id,
      |    list_transform(string_split_regex(text, '\s+'), x -> lower(x)) AS t
      |  FROM documents),
      |hits AS (
      |  SELECT doc_id,
      |    len(list_filter(t, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], x))) AS h_de,
      |    len(list_filter(t, x -> list_contains(['the','and','of','to','is','in','that','with'], x))) AS h_en,
      |    len(list_filter(t, x -> list_contains(['el','la','los','las','es','y','que','de'], x))) AS h_es,
      |    len(list_filter(t, x -> list_contains(['le','la','les','est','et','que','dans','une'], x))) AS h_fr,
      |    len(list_filter(t, x -> list_contains(['的','是','了','在','我','有','和','不'], x))) AS h_zh
      |  FROM lt)
      |SELECT doc_id,
      |  CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
      |       WHEN h_zh >= h_fr AND h_zh >= h_es AND h_zh >= h_en AND h_zh >= h_de THEN 'zh'
      |       WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
      |       WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
      |       WHEN h_en >= h_de THEN 'en'
      |       ELSE 'de' END AS lang_pred
      |FROM hits ORDER BY doc_id""".stripMargin

  /** Hashed linear quality classifier over the TRAINED weight fixture
    * (`fixtures/classifier_weights.parquet`, provenance + holdout
    * accuracy in its manifest — [[graft.tools.TrainClassifier]]):
    * md5-bucketed tokens, integer weight accumulation (exact,
    * summation-order-free), mean-weight score. Uses the zero-shuffle
    * scan-kernel form ([[TextAnalysis.classifierScoreInline]]); the
    * broadcast-relation twin is parity-pinned in ClassifierSpec. The
    * oracle joins the SAME committed relation, so the replay checks
    * the trained model, not a formula. */
  val textQualityClassifier: Q = (s, dir) => {
    TextAnalysis.classifierScoreInline(Tables.documents(s, dir), "doc_id",
        "text", TextAnalysis.trainedWeightArray(s))
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** DuckDB replay of [[textQualityClassifier]], a `def` (path resolved
    * at dump time through the fixtures override): the same 60-bit md5
    * token hash as [[dedupSimhashSql]] (first 15 hex digits as a long),
    * the committed weight relation JOINed (dense over [0, dim), so the
    * inner join drops nothing), a BIGINT weight sum so the score is
    * bit-exact through the one closing IEEE division — which is NOT
    * decimal-rounded, precisely so exact 6th-decimal ties cannot round
    * differently across engines. */
  def textQualityClassifierSql: String = {
    val hexVal = Md5Sql.hexVal
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM documents),
       |hashed AS (
       |  SELECT doc_id, ($hexVal) AS h
       |  FROM (SELECT doc_id, substring(md5(tok), 1, 15) AS h15 FROM toks)),
       |scored AS (
       |  SELECT doc_id, w.iw AS iw
       |  FROM hashed
       |  JOIN '${graft.Tables.fixturesDir}/classifier_weights.parquet' w
       |    ON (h % 1024) = w.bucket),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_tokens, CAST(sum(iw) AS BIGINT) AS raw
       |  FROM scored GROUP BY doc_id)
       |SELECT doc_id, n_tokens,
       |  CAST(raw AS DOUBLE) / (n_tokens * 1000.0) AS score,
       |  raw > 0 AS keep
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** UNIFIED typed-metadata catalog over REAL bytes — the first stage
    * a heterogeneous media lake runs: one relation (file, modality,
    * format, width, height, duration_ms, channels, sample_rate,
    * n_bytes) spanning the image fixtures (PNG/JPEG/GIF via the
    * [[graft.functions.ImageMeta]] header probe) and the media
    * fixtures (WAV/MP4 via [[graft.functions.MediaMeta]]), columns a
    * modality doesn't have as typed NULLs. Retired here (round 20):
    * the deterministic byte-length stub this query rode rounds 8–19 —
    * every value now comes from a committed container header, and the
    * oracle reads the two write-time manifests. O(header) per blob —
    * probing at the scan edge is the whole 100 TB argument. */
  val multimodalMeta: Q = (s, dir) => {
    val imgs = s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/images")
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("content"))
      .withColumn("m", graft.functions.functions.image_meta(col("content")))
      .select(col("file"), lit("image").as("modality"),
        col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("channels"),
        lit(null).cast("int").as("sample_rate"),
        col("length").as("n_bytes"))
    val med = s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/media")
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("content"))
      .withColumn("m", graft.functions.functions.media_meta(col("content")))
      .select(col("file"), lit("media").as("modality"),
        col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.duration_ms").as("duration_ms"),
        col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"),
        col("length").as("n_bytes"))
    imgs.unionByName(med).orderBy(col("file"))
  }
  /** Path-portable like [[multimodalRealSql]]. */
  def multimodalMetaSql: String =
    s"""SELECT file, 'image' AS modality, format, width, height,
       |  CAST(NULL AS BIGINT) AS duration_ms, CAST(NULL AS INT) AS channels,
       |  CAST(NULL AS INT) AS sample_rate, length AS n_bytes
       |FROM '${graft.Tables.fixturesDir}/images_manifest.parquet'
       |UNION ALL
       |SELECT file, 'media' AS modality, format, width, height,
       |  duration_ms, channels, sample_rate, length AS n_bytes
       |FROM '${graft.Tables.fixturesDir}/media_manifest.parquet'
       |ORDER BY file""".stripMargin

  /** Frame sampling over REAL multi-frame media: every `stride`-th
    * frame index of the committed animated GIFs
    * ([[graft.tools.GenGifFixtures]]), the frame COUNT recovered from
    * the BYTES by [[graft.functions.ImageFramePhash]] — the relational
    * explode a frame-level pipeline fans out with before any per-frame
    * work. Retired here (round 20): the byte-length-derived fake
    * nFrames this query exploded rounds 8–19. */
  val multimodalFrames: Q = (s, dir) => {
    s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/video")
      .select(element_at(split(col("path"), "/"), -1).as("file"),
        col("content"))
      .withColumn("n_frames",
        size(graft.functions.functions.image_frame_phashes(col("content"))))
      .select(col("file"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(2))).as("frame_idx"))
      .orderBy(col("file"), col("frame_idx"))
  }
  /** Path-portable like [[multimodalRealSql]]. */
  def multimodalFramesSql: String =
    s"""SELECT file, n_frames, frame_idx
       |FROM '${graft.Tables.fixturesDir}/video_manifest.parquet'
       |WHERE frame_idx % 2 = 0
       |ORDER BY file, frame_idx""".stripMargin

  /** REAL multimodal ingestion: Spark's `binaryFile` source over
    * committed PNG/JPEG/GIF files (JDK-encoder outputs, see
    * [[graft.tools.GenImageFixtures]]), format + dimensions recovered
    * from the BYTES alone by the codegen'd header probe
    * ([[graft.functions.ImageMeta]]) — magic number, PNG IHDR, JPEG
    * SOF walk, GIF descriptor. The oracle replays the generator's
    * write-time manifest (name, length, md5, format, w, h): truth
    * recorded independently of the parser under test, and the md5
    * pins that the engine saw the exact committed bytes end-to-end.
    * The fixture set is deliberately sf-independent — header parsing
    * costs O(header) per blob no matter the corpus, which is the whole
    * 100 TB argument for probing at the edge instead of decoding. */
  val multimodalReal: Q = (s, dir) => {
    val bf = s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/images")
    bf.select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("content"))
      .withColumn("meta", graft.functions.functions.image_meta(col("content")))
      .select(col("file"), col("length"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("file"))
  }
  /** Path-portable (a `def`, resolved at dump time): the oracle reads
    * the same `SPARK_GRAFT_FIXTURES_DIR`-resolved manifest the Spark
    * side scans, so a k8s verify job on a non-/root/repo checkout can
    * check this query too. */
  def multimodalRealSql: String =
    s"""SELECT file, length, format, width, height, content_md5
       |FROM '${graft.Tables.fixturesDir}/images_manifest.parquet'
       |ORDER BY file""".stripMargin

  /** REAL audio/video ingestion — the WAV/MP4 sibling of
    * `multimodal_real`: `binaryFile` over committed WAV + MP4 fixtures
    * ([[graft.tools.GenMediaFixtures]] — containers assembled from
    * their public specs, deterministic PCM payloads), duration /
    * channels / sample rate / dimensions recovered from the CONTAINER
    * BYTES alone by the codegen'd probe
    * ([[graft.functions.MediaMeta]]): RIFF chunk walk (the `data`
    * chunk contributes only its 8-byte header — samples are never
    * read) and ISO-BMFF box walk (`moov`→`mvhd`/`tkhd`). Oracle =
    * the generator's write-time manifest, truth recorded independently
    * of the parser; md5 pins the exact committed bytes. O(header) per
    * blob regardless of media size — the same 100 TB edge-probe
    * argument as the image twin. */
  val multimodalAudio: Q = (s, dir) => {
    val bf = s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/media")
    bf.select(element_at(split(col("path"), "/"), -1).as("file"),
        col("length"), col("content"))
      .withColumn("meta", graft.functions.functions.media_meta(col("content")))
      .select(col("file"), col("length"),
        col("meta.format").as("format"),
        col("meta.duration_ms").as("duration_ms"),
        col("meta.channels").as("channels"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("file"))
  }
  /** Path-portable like [[multimodalRealSql]]. */
  def multimodalAudioSql: String =
    s"""SELECT file, length, format, duration_ms, channels, sample_rate,
       |  width, height, content_md5
       |FROM '${graft.Tables.fixturesDir}/media_manifest.parquet'
       |ORDER BY file""".stripMargin

  /** IMAGE-NATIVE perceptual near-dup dedup — the dedup family's image
    * member, operating on PIXELS, not captions or embeddings (a fresh
    * crawl has neither): `binaryFile` over the committed near-dup
    * fixture set ([[graft.tools.GenPhashFixtures]] — planted
    * byte-copy / JPEG-re-encode / one-pixel-edit clusters), the
    * codegen'd perceptual signature ([[graft.functions.ImagePhash]]:
    * decode → exact integer 8×8 luminance grid → aHash bits), then the
    * EXISTING Manku block machinery over the 64-bit signature — 4×16-bit
    * band keys, star edges, exact Hamming ≤ 3 verification, connected
    * components ([[Dedup.componentsFromStar]]) — and one exemplar file
    * per cluster. Doc ids are the portable md5-60 of the file name, so
    * the whole chain replays in DuckDB from the write-time manifest
    * (which pins ahash/dhash per committed byte stream: a drift in the
    * decode or the grid math breaks the hash compare, not just a spec).
    * Scale shape: image bytes never shuffle — the decode happens in the
    * scan, and everything past the first select moves 64-bit keys; the
    * banding join is the simhash serving path's, so the 100 TB story
    * (block-pruned candidates, component graph bounded by duplicate
    * structure) is inherited, not new. */
  /** The perceptual-cluster chain shared by [[multimodalPhashDedup]]
    * and the cross-modal flagship (`corpus_pipeline_mm`): sign the
    * committed fixture bytes, Manku-band the 64-bit aHash through the
    * simhash block machinery, star-edge + exact-Hamming-verify,
    * resolve components, name each file's exemplar. One definition so
    * the flagship can never de-synchronize from the dedup gate.
    * Returns (file, ahash, dhash, exemplar). */
  private[queries] def phashExemplars(s: SparkSession): DataFrame = {
    val bf = s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/images_dup")
    val sigs = bf.select(
        element_at(split(col("path"), "/"), -1).as("file"), col("content"))
      .withColumn("ph", graft.functions.functions.image_phash(col("content")))
      .select(col("file"), Dedup.md5TokenHash60(col("file")).as("id"),
        col("ph.ahash").as("ahash"), col("ph.dhash").as("dhash"))
      .localCheckpoint()
    val banded = Dedup.simhashBlocks(
        sigs.select(col("id"), col("ahash").as("sig")), bits = 64, blocks = 4)
      .select(col("id"), col("b").as("band"), col("key").as("bucket"))
    val verified = Dedup.starEdges(banded)
      .join(sigs.select(col("id"), col("ahash").as("sigA"),
        col("dhash").as("dA")), Seq("id"))
      .join(sigs.select(col("id").as("root"), col("ahash").as("sigB"),
        col("dhash").as("dB")), Seq("root"))
      .filter(Dedup.hamming(col("sigA"), col("sigB")) <= 3 &&
        Dedup.hamming(col("dA"), col("dB")) <= 3)
      .select(col("id"), col("root"))
    val comps = Dedup.componentsFromStar(sigs.select(col("id")), verified)
    sigs.join(comps, Seq("id"))
      .join(sigs.select(col("id").as("component"), col("file").as("exemplar")),
        Seq("component"))
      .select(col("file"), col("ahash"), col("dhash"), col("exemplar"))
  }

  /** The DuckDB twin of [[phashExemplars]] — the manifest replay CTEs
    * ending in `pids(file, ahash, dhash, id)`, `pcomp(id, component)`.
    * Shared verbatim by both phash-cluster oracles. */
  private[queries] def phashComponentCtes: String = {
    val hexVal = Md5Sql.hexVal
    val bandExprs = (0 until 4).map(b => s"(ahash >> ${b * 16}) & 65535").mkString(", ")
    s"""pm AS (
       |  SELECT file, ahash, dhash
       |  FROM '${graft.Tables.fixturesDir}/images_dup_manifest.parquet'),
       |pids AS (
       |  SELECT file, ahash, dhash, CAST($hexVal AS BIGINT) AS id
       |  FROM (SELECT file, ahash, dhash, substring(md5(file), 1, 15) AS h15 FROM pm)),
       |pbanded AS (
       |  SELECT id, unnest([$bandExprs]) AS bucket, unnest([0, 1, 2, 3]) AS band
       |  FROM pids),
       |pmins AS (SELECT band, bucket, min(id) AS root FROM pbanded GROUP BY band, bucket),
       |pstar AS (
       |  SELECT DISTINCT b.id, m2.root FROM pbanded b JOIN pmins m2 USING (band, bucket)
       |  WHERE b.id <> m2.root),
       |pverified AS (
       |  SELECT s.id, s.root FROM pstar s
       |  JOIN pids a ON a.id = s.id JOIN pids r ON r.id = s.root
       |  WHERE bit_count(xor(a.ahash, r.ahash)) <= 3
       |    AND bit_count(xor(a.dhash, r.dhash)) <= 3),
       |pedges AS (
       |  SELECT id AS src, root AS dst FROM pverified
       |  UNION SELECT root AS src, id AS dst FROM pverified),
       |preach(id, label) AS (
       |  SELECT id, id FROM pids
       |  UNION
       |  SELECT e.dst, r.label FROM preach r JOIN pedges e ON e.src = r.id),
       |pcomp AS (SELECT id, min(label) AS component FROM preach GROUP BY id)""".stripMargin
  }

  val multimodalPhashDedup: Q = (s, dir) =>
    phashExemplars(s).orderBy(col("file"))
  /** Path-portable like [[multimodalRealSql]]; the banding, Hamming
    * verify, and label-fixpoint components replay the `dedup_cluster`
    * oracle structure over the manifest's pinned signatures. */
  def multimodalPhashDedupSql: String =
    s"""WITH RECURSIVE $phashComponentCtes
       |SELECT i.file, i.ahash, i.dhash, x.file AS exemplar
       |FROM pids i JOIN pcomp c ON c.id = i.id
       |JOIN pids x ON x.id = c.component
       |ORDER BY i.file""".stripMargin

  /** INCREMENTAL image near-dup — the phash family's serving-store
    * path ([[Multimodal.appendPhashIndexEpoch]] +
    * [[Multimodal.newVsCorpusPhash]]): the fixture set splits into the
    * accumulated CORPUS (the scene base images) and the ARRIVALS (the
    * byte copy, JPEG re-encodes, one-pixel edit); the corpus signs
    * once into the block store, the batch is decoded/signed and probed
    * by block equality, verified by one bit_count(xor) PER SIGNATURE
    * (aHash candidates, aHash + dHash confirm) — exactly the
    * crawl-ingest image-dedup shape, lossless at Hamming ≤ 3. Each
    * planted arrival must surface against ITS scene's base and nothing
    * else (the oracle replays split + banding + dual verify from the
    * manifest). */
  val multimodalPhashInc: Q = (s, dir) => {
    val bf = s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/images_dup")
    val all = bf.select(
        element_at(split(col("path"), "/"), -1).as("file"), col("content"))
      .withColumn("ph", graft.functions.functions.image_phash(col("content")))
      .select(col("file"), Dedup.md5TokenHash60(col("file")).as("id"),
        col("ph.ahash").as("sig"), col("ph.dhash").as("dsig"))
      .localCheckpoint()
    val isArrival = col("file").rlike("copy|q90|q70|pixel")
    val storeDir = graft.Staging.dirFor("phash-inc-q")
    Multimodal.appendPhashIndexEpoch(all.filter(!isArrival), storeDir,
      epoch = 0L)
    Multimodal.newVsCorpusPhash(s, storeDir, all.filter(isArrival),
        maxDist = 3)
      .join(all.select(col("id").as("id1"), col("file").as("file_new")),
        Seq("id1"))
      .join(all.select(col("id").as("id2"), col("file").as("file_store")),
        Seq("id2"))
      .select(col("file_new"), col("file_store"), col("dist"))
      .orderBy(col("file_new"), col("file_store"))
  }
  /** Path-portable like [[multimodalRealSql]]; split + banding +
    * Hamming verify replayed from the manifest's pinned signatures. */
  def multimodalPhashIncSql: String = {
    val bands = (0 until 4).map(b => s"(ahash >> ${b * 16}) & 65535")
      .mkString(", ")
    s"""WITH m AS (
       |  SELECT file, ahash, dhash
       |  FROM '${graft.Tables.fixturesDir}/images_dup_manifest.parquet'),
       |arr AS (SELECT * FROM m WHERE regexp_matches(file, 'copy|q90|q70|pixel')),
       |st AS (SELECT * FROM m WHERE NOT regexp_matches(file, 'copy|q90|q70|pixel')),
       |ab AS (
       |  SELECT file, ahash, dhash, unnest([$bands]) AS key,
       |    unnest([0, 1, 2, 3]) AS b
       |  FROM arr),
       |sb AS (
       |  SELECT file, ahash, dhash, unnest([$bands]) AS key,
       |    unnest([0, 1, 2, 3]) AS b
       |  FROM st)
       |SELECT DISTINCT ab.file AS file_new, sb.file AS file_store,
       |  CAST(bit_count(xor(ab.ahash, sb.ahash)) AS BIGINT) AS dist
       |FROM ab JOIN sb ON ab.b = sb.b AND ab.key = sb.key
       |WHERE bit_count(xor(ab.ahash, sb.ahash)) <= 3
       |  AND bit_count(xor(ab.dhash, sb.dhash)) <= 3
       |ORDER BY file_new, file_store""".stripMargin
  }

  /** MULTI-FRAME (video) perceptual near-dup — the dedup family's
    * video member (VERDICT r19 Missing #3): per-frame signatures from
    * the committed animated GIFs ([[graft.functions.ImageFramePhash]]
    * — decode in the scan, only (frame_idx, 128-bit) rows shuffle),
    * frame-level Manku banding + dual-hash verify through the EXISTING
    * phash block machinery, then SCENE-level evidence: matched frames
    * (within AND across clips) first cluster into SCENES (connected
    * components over the verified frame graph — a title card shown for
    * three frames is ONE scene however many frame pairs it generates),
    * and two clips merge iff they share ≥ 2 distinct scenes (the
    * `vid_s00_one` single-shared-frame plant AND the `vid_s04_*`
    * repeated-title-card plant — 4 matching frame pairs, one scene —
    * must both stay unmerged). Clip components + exemplar naming then
    * run exactly as the still-image gate. The oracle replays banding +
    * verify + the scene fixpoint + the evidence threshold + the clip
    * fixpoint from the write-time per-frame manifest. Scale shape:
    * candidates are block-bucketed per FRAME (never clip²), the scene
    * graph is bounded by duplicate structure, evidence is one distinct
    * aggregation over (clip, scene). */
  val multimodalVideoDedup: Q = (s, dir) => {
    val bf = s.read.format("binaryFile")
      .load(s"${graft.Tables.fixturesDir}/video")
    val frames = bf.select(
        element_at(split(col("path"), "/"), -1).as("file"), col("content"))
      .withColumn("fr",
        explode(graft.functions.functions.image_frame_phashes(col("content"))))
      .select(col("file"),
        Dedup.md5TokenHash60(concat(col("file"), lit("#"),
          col("fr.frame_idx").cast("string"))).as("id"),
        col("fr.ahash").as("sig"), col("fr.dhash").as("dsig"))
      .localCheckpoint()
    val blk = Dedup.simhashBlocks(frames.select("id", "sig", "dsig"),
      bits = 64, blocks = 4, carry = Seq("dsig"))
    // verified frame matches INCLUDING within-clip pairs — scene
    // identity is a cluster property, not a pair property
    val framePairs = Multimodal.probePhashBlocks(blk, blk, blocks = 4,
        maxDist = 3)
      .filter(col("id1") < col("id2"))
    val scenes = Dedup.componentsFromStar(frames.select(col("id")),
        framePairs.select(col("id1").as("id"), col("id2").as("root")))
      .withColumnRenamed("component", "scene")
    val clipScenes = frames.select(col("file"), col("id"))
      .join(scenes, Seq("id"))
      .select(col("file"), col("scene")).distinct()
    val evidence = clipScenes.select(col("file").as("fa"), col("scene"))
      .join(clipScenes.select(col("file").as("fb"), col("scene")), Seq("scene"))
      .filter(col("fa") < col("fb"))
      .groupBy(col("fa"), col("fb"))
      .agg(count(lit(1)).as("n_scenes"))
      .filter(col("n_scenes") >= 2)
    val files = frames.groupBy(col("file"))
      .agg(count(lit(1)).as("n_frames"))
      .withColumn("fid", Dedup.md5TokenHash60(col("file")))
    val edges = evidence
      .join(files.select(col("file").as("fa"), col("fid").as("id")), Seq("fa"))
      .join(files.select(col("file").as("fb"), col("fid").as("root")), Seq("fb"))
      .select(col("id"), col("root"))
    val comps = Dedup.componentsFromStar(files.select(col("fid").as("id")), edges)
      .withColumnRenamed("id", "fid")
    files.join(comps, Seq("fid"))
      .join(files.select(col("fid").as("component"), col("file").as("exemplar")),
        Seq("component"))
      .select(col("file"), col("n_frames"), col("exemplar"))
      .orderBy(col("file"))
  }
  /** Path-portable; banding + dual verify + the scene fixpoint + the
    * ≥ 2-distinct-scene evidence rule + the clip fixpoint, all
    * replayed from the per-frame manifest. */
  def multimodalVideoDedupSql: String = {
    val hexVal = Md5Sql.hexVal
    val bands = (0 until 4).map(b => s"(ahash >> ${b * 16}) & 65535")
      .mkString(", ")
    s"""WITH RECURSIVE vm AS (
       |  SELECT file, frame_idx, ahash, dhash
       |  FROM '${graft.Tables.fixturesDir}/video_manifest.parquet'),
       |fids AS (
       |  SELECT file, ahash, dhash, CAST($hexVal AS BIGINT) AS id
       |  FROM (SELECT file, ahash, dhash,
       |        substring(md5(file || '#' || CAST(frame_idx AS VARCHAR)), 1, 15) AS h15
       |        FROM vm)),
       |vids AS (
       |  SELECT file, CAST($hexVal AS BIGINT) AS fid
       |  FROM (SELECT DISTINCT file, substring(md5(file), 1, 15) AS h15 FROM vm)),
       |vb AS (
       |  SELECT id, ahash, dhash, file, unnest([$bands]) AS key,
       |    unnest([0, 1, 2, 3]) AS b
       |  FROM fids),
       |vpair AS (
       |  SELECT DISTINCT a.id AS id1, c.id AS id2
       |  FROM vb a JOIN vb c ON a.b = c.b AND a.key = c.key AND a.id < c.id
       |  WHERE bit_count(xor(a.ahash, c.ahash)) <= 3
       |    AND bit_count(xor(a.dhash, c.dhash)) <= 3),
       |fedges AS (
       |  SELECT id1 AS src, id2 AS dst FROM vpair
       |  UNION SELECT id2, id1 FROM vpair),
       |freach(id, label) AS (
       |  SELECT id, id FROM fids
       |  UNION
       |  SELECT e.dst, r.label FROM freach r JOIN fedges e ON e.src = r.id),
       |fscene AS (SELECT id, min(label) AS scene FROM freach GROUP BY id),
       |clipscenes AS (
       |  SELECT DISTINCT f.file, sc.scene
       |  FROM fids f JOIN fscene sc ON sc.id = f.id),
       |vshared AS (
       |  SELECT a.file AS fa, c.file AS fb, count(*) AS ns
       |  FROM clipscenes a JOIN clipscenes c
       |    ON a.scene = c.scene AND a.file < c.file
       |  GROUP BY 1, 2),
       |vedges AS (
       |  SELECT va.fid AS src, vz.fid AS dst
       |  FROM vshared s JOIN vids va ON va.file = s.fa
       |  JOIN vids vz ON vz.file = s.fb
       |  WHERE s.ns >= 2
       |  UNION
       |  SELECT vz.fid, va.fid
       |  FROM vshared s JOIN vids va ON va.file = s.fa
       |  JOIN vids vz ON vz.file = s.fb
       |  WHERE s.ns >= 2),
       |vreach(id, label) AS (
       |  SELECT fid, fid FROM vids
       |  UNION
       |  SELECT e.dst, r.label FROM vreach r JOIN vedges e ON e.src = r.id),
       |vcomp AS (SELECT id, min(label) AS component FROM vreach GROUP BY id),
       |nf AS (SELECT file, CAST(count(*) AS BIGINT) AS n_frames FROM vm GROUP BY file)
       |SELECT v.file, nf.n_frames, x.file AS exemplar
       |FROM vids v JOIN vcomp c ON c.id = v.fid
       |JOIN vids x ON x.fid = c.component
       |JOIN nf ON nf.file = v.file
       |ORDER BY v.file""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // Registry                                                          //
  // ---------------------------------------------------------------- //

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q3_top_orders" -> q3TopOrders,
    "q5_region_revenue" -> q5RegionRevenue,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q_window_top_orders" -> qWindowTopOrders,
    "q_events_hourly" -> qEventsHourly,
    "b3_verb_filter" -> b3VerbFilter,
    "b4_subresource_filter" -> b4SubresourceFilter,
    "b7_path_derivation" -> b7PathDerivation,
    "b8_serialize" -> b8Serialize,
    "b10_zip_roundtrip" -> b10ZipRoundtrip,
    "d2_rules_join" -> d2RulesJoin,
    "d6_glob_match" -> d6GlobMatch,
    "d7_namespace_filter" -> d7NamespaceFilter,
    "d10_json_projection" -> d10JsonProjection,
    "d11_scrub" -> d11Scrub,
    "d12_cdc_last_state" -> d12CdcLastState,
    "d1_snapshot_diff" -> d1SnapshotDiff,
    "sync_pipeline_filtered" -> syncPipelineFiltered,
    "dedup_exact" -> dedupExact,
    "dedup_jaccard_top" -> dedupJaccardTop,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_incremental" -> dedupIncremental,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding_cos" -> dedupEmbeddingCos,
    "dedup_semantic" -> dedupSemantic,
    "dedup_semantic_incremental" -> dedupSemanticIncremental,
    "ann_topk" -> annTopK,
    "ann_lsh" -> annLsh,
    "text_stats" -> textStats,
    "text_fingerprint" -> textFingerprint,
    "text_lang_id" -> textLangId,
    "text_quality_classifier" -> textQualityClassifier,
    "text_quality_audit" -> textQualityAudit,
    "multimodal_meta" -> multimodalMeta,
    "multimodal_frames" -> multimodalFrames,
    "multimodal_real" -> multimodalReal,
    "multimodal_audio" -> multimodalAudio,
    "multimodal_phash_dedup" -> multimodalPhashDedup,
    "multimodal_phash_inc" -> multimodalPhashInc,
    "multimodal_video_dedup" -> multimodalVideoDedup)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q3_top_orders" -> q3TopOrdersSql,
    "q5_region_revenue" -> q5RegionRevenueSql,
    "q7_volume_shipping" -> q7VolumeShippingSql,
    "q_window_top_orders" -> qWindowTopOrdersSql,
    "q_events_hourly" -> qEventsHourlySql,
    "b3_verb_filter" -> b3VerbFilterSql,
    "b4_subresource_filter" -> b4SubresourceFilterSql,
    "b7_path_derivation" -> b7PathDerivationSql,
    "b8_serialize" -> b8SerializeSql,
    "b10_zip_roundtrip" -> b10ZipRoundtripSql,
    "d2_rules_join" -> d2RulesJoinSql,
    "d6_glob_match" -> d6GlobMatchSql,
    "d7_namespace_filter" -> d7NamespaceFilterSql,
    "d10_json_projection" -> d10JsonProjectionSql,
    "d11_scrub" -> d11ScrubSql,
    "d12_cdc_last_state" -> d12CdcLastStateSql,
    "d1_snapshot_diff" -> d1SnapshotDiffSql,
    "sync_pipeline_filtered" -> syncPipelineFilteredSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_jaccard_top" -> dedupJaccardTopSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_embedding_cos" -> dedupEmbeddingCosSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_semantic_incremental" -> dedupSemanticIncrementalSql,
    "ann_topk" -> annTopKSql,
    "ann_lsh" -> annLshSql,
    "text_stats" -> textStatsSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_lang_id" -> textLangIdSql,
    "text_quality_classifier" -> textQualityClassifierSql,
    "text_quality_audit" -> textQualityAuditSql,
    "multimodal_meta" -> multimodalMetaSql,
    "multimodal_frames" -> multimodalFramesSql,
    "multimodal_real" -> multimodalRealSql,
    "multimodal_audio" -> multimodalAudioSql,
    "multimodal_phash_dedup" -> multimodalPhashDedupSql,
    "multimodal_phash_inc" -> multimodalPhashIncSql,
    "multimodal_video_dedup" -> multimodalVideoDedupSql)
}
