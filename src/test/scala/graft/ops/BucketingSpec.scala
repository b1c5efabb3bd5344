package graft.ops

import graft.SparkSpec

/** Bucketed co-located join: the shuffle is paid once at write time;
  * the join plan itself must contain NO Exchange on either side.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without any exchange") {
    val dir = java.nio.file.Files.createTempDirectory("buckets").toFile.getAbsolutePath
    val orders = (1L to 2000L).map(i => (i, s"cust${i % 97}", i * 1.5))
      .toDF("o_key", "cust", "total")
    val items = (1L to 2000L).flatMap(i => Seq((i, s"item-a-$i"), (i, s"item-b-$i")))
      .toDF("o_key", "item")
    Bucketing.writeBucketed(orders, "orders_b", s"$dir/orders", Seq("o_key"), 8)
    Bucketing.writeBucketed(items, "items_b", s"$dir/items", Seq("o_key"), 8)

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "orders_b", "items_b", Seq("o_key"))
      assert(joined.count() == 4000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // bucket pruning composes: a bucket-key filter reads a file subset
      val one = spark.table("orders_b").filter($"o_key" === 42L)
      assert(one.count() == 1)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS items_b")
    }
  }
}
