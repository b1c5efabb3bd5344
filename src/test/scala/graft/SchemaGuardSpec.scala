package graft

import org.apache.spark.sql.functions._

/** [[SchemaGuard]]: the recorded fingerprints match the live testdata
  * (this test IS the canary — it fails the suite the round the driver
  * regenerates types), and an intentional type flip is detected. */
class SchemaGuardSpec extends SparkSpec {

  test("live testdata matches the recorded fingerprints at every gate sf") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val d = SchemaGuard.drift(spark, dir)
      assert(d.isEmpty, s"schema drift under $dir:\n${d.mkString("\n")}")
    }
  }

  test("an intentional type flip is reported for exactly that table") {
    val tmp = java.nio.file.Files.createTempDirectory("schema-guard").toString
    // clone the real layout, then flip events.ts to BIGINT epoch-nanos
    // (the exact round-9 drift shape, in reverse)
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val out = if (t == "events")
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
      else df
      out.write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val d = SchemaGuard.drift(spark, tmp)
    assert(d.length == 1 && d.head.startsWith("events:"),
      s"expected exactly the events drift, got:\n${d.mkString("\n")}")
    assert(d.head.contains("ts:bigint"), d.head)
  }
}
