package graft

import org.apache.spark.sql.SparkSession

/** Physical-schema drift detector for the harness tables (round-10
  * directive #9). The driver regenerates `/root/testdata` between
  * rounds and has ALREADY changed physical types once (`events.ts`:
  * TIMESTAMP(NANOS) through round 8 → timestamp[us] NTZ from round 9),
  * silently breaking 6 event-time queries for a full round. This guard
  * makes the next regen LOUD instead of silent: Verify compares every
  * table's as-read schema against the fingerprint recorded here and
  * prints an unmissable warning on any drift — behavior is otherwise
  * unchanged (queries still run; the normalizing readers in [[Tables]]
  * absorb known drift shapes).
  *
  * Fingerprints recorded 2026-08-14 from the round-11 testdata
  * (pyarrow physical types: ints int32/int64, doubles, strings,
  * timestamps timestamp[us] no-tz → Spark `timestamp_ntz` under
  * default NTZ inference, embeddings list<float>).
  */
object SchemaGuard {

  val expected: Map[String, String] = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint,ts:timestamp_ntz,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  /** The as-read fingerprint of one table, or the read error. */
  def fingerprint(spark: SparkSession, sfDir: String, name: String): Either[String, String] =
    try Right(spark.read.parquet(s"$sfDir/$name.parquet").schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
    catch { case scala.util.control.NonFatal(e) => Left(String.valueOf(e.getMessage)) }

  /** All drifted/unreadable tables under `sfDir`, as printable lines
    * (empty = all fingerprints match). */
  def drift(spark: SparkSession, sfDir: String): Seq[String] =
    expected.keys.toSeq.sorted.flatMap { t =>
      fingerprint(spark, sfDir, t) match {
        case Right(fp) if fp == expected(t) => None
        case Right(fp) => Some(s"$t: expected [${expected(t)}] read [$fp]")
        case Left(err) => Some(s"$t: unreadable: $err")
      }
    }

  /** Print loudly on drift; never throw, never change behavior. */
  def warnOnDrift(spark: SparkSession, sfDir: String): Unit = {
    val d = drift(spark, sfDir)
    if (d.nonEmpty) {
      System.err.println("=" * 72)
      System.err.println(s"[schema-guard] TESTDATA SCHEMA DRIFT under $sfDir —")
      System.err.println("[schema-guard] the driver regenerated testdata with different")
      System.err.println("[schema-guard] physical types (this silently broke 6 queries in")
      System.err.println("[schema-guard] round 9). Tables normalizers may absorb it; review")
      System.err.println("[schema-guard] this round's CORRECTNESS with suspicion.")
      d.foreach(l => System.err.println(s"[schema-guard]   $l"))
      System.err.println("=" * 72)
    }
  }
}
