package graft.sources.v2

import java.util
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 `zip-entries` format: one row per ZIP-archive entry,
  * schema `entry_name: string, archive: string, content: binary`.
  *
  * The capability of the reference's custom input format
  * (`NYUZInputFormat.java:22-82` / `NYUZRecordReader.java:23-102`)
  * re-planned for Spark's connector API, fixing its scale bugs:
  *
  *  - **Planning is metadata-only.** One InputPartition per archive
  *    from a driver-side file *listing* — the reference decompressed
  *    the entire corpus on the driver just to compute split offsets
  *    (`NYUZInputFormat.java:24-52`).
  *  - **Each archive is read exactly once, streamed.** The reader
  *    walks the entry stream forward; the reference re-decompressed
  *    the archive prefix per task — O(n²) total work
  *    (`NYUZRecordReader.java:70-76`) — and emitted its first entry
  *    twice (n+1 splits, `NYUZInputFormat.java:54-66`).
  *  - **No whole-archive buffering.** Unlike the `binaryFile` route
  *    (`graft.sources.ZipEntries`), content is materialized per
  *    *entry*, so archive size is not bounded by the 2 GB binaryFile
  *    cap — only entry size matters.
  *  - **Column pruning.** A projection without `content` skips entry
  *    materialization (names stream from the directory headers).
  *
  * Usage: `spark.read.format("zip-entries").load(pathOrGlob)`.
  */
class ZipEntriesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zip-entries"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZipEntriesSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ZipEntriesTable(CaseInsensitiveMap(properties.asScala.toMap))

  override def supportsExternalMetadata(): Boolean = true
}

object ZipEntriesSource {
  val Schema: StructType = StructType(Seq(
    StructField("entry_name", StringType, nullable = false),
    StructField("archive", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))
}

class ZipEntriesTable(options: CaseInsensitiveMap[String])
    extends Table with SupportsRead {
  override def name(): String = s"zip-entries(${options.getOrElse("path", "?")})"
  override def schema(): StructType = ZipEntriesSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ZipScanBuilder(caseInsensitiveOptions.asScala.toMap ++ options)
}

class ZipScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ZipEntriesSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ZipScan(options, required)
}

class ZipScan(options: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("zip-entries: 'path' is required"))
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
    val statuses = Option(fs.globStatus(hadoopPath)) match {
      case Some(s) if s.nonEmpty => s.toSeq
      case _ => throw new java.io.FileNotFoundException(s"zip-entries: no files match $path")
    }
    val files = statuses.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory) else Seq(st)
    }
    files.map(f => ZipArchivePartition(f.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    new ZipReaderFactory(conf, required)
  }
}

case class ZipArchivePartition(path: String) extends InputPartition

class ZipReaderFactory(conf: SerializableConfiguration, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZipEntryReader(partition.asInstanceOf[ZipArchivePartition].path, conf, required)
}

/** Streams one archive's entries forward; materializes content only if
  * the projection asks for it. */
class ZipEntryReader(path: String, conf: SerializableConfiguration, required: StructType)
    extends PartitionReader[InternalRow] {

  private val needContent = required.fieldNames.contains("content")
  private val hPath = new Path(path)
  private val in = hPath.getFileSystem(conf.value).open(hPath)
  private val zis = new ZipInputStream(in, java.nio.charset.StandardCharsets.UTF_8)
  private val archiveUtf8 = UTF8String.fromString(path)
  private var row: InternalRow = _

  override def next(): Boolean = {
    var e = zis.getNextEntry
    while (e != null && e.isDirectory) { zis.closeEntry(); e = zis.getNextEntry }
    if (e == null) return false
    val values = required.fieldNames.map {
      case "entry_name" => UTF8String.fromString(e.getName)
      case "archive"    => archiveUtf8
      case "content"    => zis.readAllBytes()
    }
    if (!needContent) zis.closeEntry() // skip payload without materializing
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = { zis.close(); in.close() }
}
