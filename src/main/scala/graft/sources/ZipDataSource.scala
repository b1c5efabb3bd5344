package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

import java.util.zip.ZipInputStream
import scala.collection.mutable.ArrayBuffer

/** DataSource V2 reader for the engine's export archives (B9/B10): the
  * inverse of [[graft.sinks.ZipSink]], closing the export→ingest round
  * trip the reference leaves to `unzip` (/root/reference/pkg/sink/
  * zip.go:27-53 writes archives; nothing reads them back).
  *
  *   spark.read.format("graft-zip").load("/exports")   // file or dir
  *   → (archive string, path string, data string)
  *
  * Spark-first mechanics:
  *   - one [[InputPartition]] per archive — a sharded export
  *     (`part-*.zip`) parallelizes across the cluster exactly as it was
  *     written, no driver bottleneck;
  *   - column pruning is pushed into the reader
  *     ([[SupportsPushDownRequiredColumns]]): a `path`-only projection
  *     never materializes entry bytes (`ZipInputStream.closeEntry` skips
  *     the payload), so `count`/listing scans stream metadata only;
  *   - entries stream one at a time — memory is O(largest entry), not
  *     O(archive).
  */
class ZipDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zip"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ZipTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object ZipDataSource {
  val schema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("data", StringType, nullable = true)))

  /** Expand a file-or-directory path into the archive list. */
  def archivesUnder(root: String): Seq[String] = {
    val f = new java.io.File(root)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.endsWith(".zip")).map(_.getAbsolutePath)
        .sorted.toSeq
    else Seq(f.getAbsolutePath)
  }
}

final class ZipTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-zip requires a load path")
  override def name(): String = s"graft-zip:$path"
  override def schema(): StructType = ZipDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(path)
}

final class ZipScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ZipDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def build(): Scan = new ZipScan(path, required)
}

final case class ZipArchivePartition(archive: String) extends InputPartition

final class ZipScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-zip $path, columns [${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    ZipDataSource.archivesUnder(path).map(ZipArchivePartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ZipReaderFactory(required.fieldNames)
}

final class ZipReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZipEntryReader(partition.asInstanceOf[ZipArchivePartition].archive, columns)
}

/** Streams one archive's entries; reads entry bytes only when the `data`
  * column survived pruning. */
final class ZipEntryReader(archive: String, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private val needData = columns.contains("data")
  private val zis = new ZipInputStream(
    new java.io.BufferedInputStream(new java.io.FileInputStream(archive)))
  private val archiveU = UTF8String.fromString(archive)
  private var row: InternalRow = _

  override def next(): Boolean = {
    val e = zis.getNextEntry
    if (e == null) return false
    val data: UTF8String =
      if (needData) {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = zis.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = zis.read(chunk) }
        UTF8String.fromBytes(buf.toByteArray)
      } else null // pruned: closeEntry skips the payload without decoding
    zis.closeEntry()
    val values = new ArrayBuffer[Any](columns.length)
    columns.foreach {
      case "archive" => values += archiveU
      case "path" => values += UTF8String.fromString(e.getName)
      case "data" => values += data
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    row = new GenericInternalRow(values.toArray)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = zis.close()
}
