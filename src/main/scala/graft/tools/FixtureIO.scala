package graft.tools

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
/** Single-file parquet writer shared by the fixture tools: fixtures are
  * committed as ONE stable file (not a part-directory) so paths are
  * plain and diffs are meaningful. */
object FixtureIO {
  def writeSingleFile(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    val tmp = Files.createTempDirectory("fixture-write").toString
    // coalesce HERE (idempotent if the caller already did) so the
    // exactly-one-part assumption is enforced, not remembered
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val parts = new File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length == 1,
      s"expected exactly one part file in $tmp, found ${parts.length}")
    new File(dest).getParentFile.mkdirs()
    Files.move(parts.head.toPath, Paths.get(dest),
      StandardCopyOption.REPLACE_EXISTING)
    // drop the temp dir (remaining _SUCCESS/CRC files, and any
    // _temporary subtree a retried task left) — recursive, and never
    // after the fixture already landed should cleanup fail the tool
    def deleteRec(f: File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    deleteRec(new File(tmp))
  }
}
