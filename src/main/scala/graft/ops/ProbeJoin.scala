package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Stage-by-stage timing/cardinality probe for [[Dedup.prefixJaccardJoin]]
  * (shingles → prefix → candidates → verify), the measurement loop behind
  * the SCALING.md round-13 similarity-join section. Lives in graft.ops for
  * access to the private candidate stages. */
object ProbeJoin {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val sh = Dedup.shingleHashes(docs, "doc_id", "text", 3).persist()
      println(s"[probe] shingle rows: ${timed("shingles")(sh.count())}")
      val prefix = Dedup.rarityPrefix(sh, 0.6).persist()
      println(s"[probe] prefix rows: ${timed("prefix")(prefix.count())}")
      val bestOverlap = lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))
      val needed = lit(0.6 / 1.6) * (col("a.sz") + col("b.sz"))
      val joined = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")) >= lit(0.6) * greatest(col("a.sz"), col("b.sz")) &&
          bestOverlap >= needed)
      println(s"[probe] join rows: ${timed("joinrows")(joined.count())}")
      val cands = joined.select(col("a.id").as("id1"), col("b.id").as("id2")).distinct().persist()
      println(s"[probe] candidates: ${timed("cands")(cands.count())}")
      val s1 = sh.select(col("id").as("id1"), col("shingle"))
      val s2 = sh.select(col("id").as("id2"), col("shingle"))
      val inter = cands.join(s1, Seq("id1")).join(s2, Seq("id2", "shingle"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
      println(s"[probe] verified pairs: ${timed("verify")(inter.count())}")
      val out = timed("full")(Dedup.prefixJaccardJoin(docs, "doc_id", "text", 0.6).count())
      println(s"[probe] output pairs: $out")
    } finally spark.stop()
  }
}
