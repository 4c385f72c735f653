package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP-archive source: one row per ZIP entry, `entry_name: string,
  * content: binary` — the capability of the reference's custom input
  * format (`src/main/java/NYUZInputFormat.java:22-82`,
  * `NYUZRecordReader.java:23-102`: key = entry name, value = fully
  * decompressed entry bytes, "parallelizing files, not lines").
  *
  * Spark-first design, deliberately NOT a port:
  *  - planning is lazy and footer-free: `binaryFile` plans one input
  *    partition per archive; entry expansion happens executor-side in a
  *    flatMap. The reference instead decompressed the whole corpus on
  *    the driver at planning time (`NYUZInputFormat.java:24-52`) and
  *    re-read the archive prefix per task (O(n²) total,
  *    `NYUZRecordReader.java:70-76`) — neither survives 100 TB.
  *  - none of the reference's bugs are inherited (n+1 splits with a
  *    double-read first entry, single-input-path-only; SURVEY.md §3.2).
  *  - parallelism unit is the archive; for few-large-archives corpora
  *    call `.repartition()` after entry expansion (entries are then the
  *    shuffle rows) or explode to lines first — see [[entryLines]].
  *
  * ZIP's central directory cannot be range-split without decompressing,
  * so per-archive is the natural planning grain; the binaryFile source
  * caps file size at `spark.sql.sources.binaryFile.maxLength` (2 GB),
  * matching ZIP32's practical limits.
  */
object ZipEntries {

  /** All entries of all archives matching `path` (glob ok). */
  def entries(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (_, bytes) => readArchive(bytes) }
      .toDF("entry_name", "content")
  }

  /** Whole-file records: one row per entry, decoded UTF-8.
    * Matches the reference's "custom8" record granularity (SURVEY.md §5.2). */
  def entryText(spark: SparkSession, path: String): DataFrame =
    entries(spark, path)
      .select(col("entry_name"), decode(col("content"), "UTF-8").as("value"))

  /** Line records: entries exploded into `\n`-separated lines.
    * Matches the committed pipeline's `TextInputFormat` granularity
    * ("custom9"); also the scale path — line rows shuffle/balance freely. */
  def entryLines(spark: SparkSession, path: String): DataFrame =
    entries(spark, path)
      .select(col("entry_name"),
        explode(split(decode(col("content"), "UTF-8"), "\r?\n")).as("value"))

  /** Decode one in-memory archive to (entryName, bytes) pairs.
    * Runs executor-side; materializes one entry at a time. */
  private[graft] def readArchive(zipBytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(zipBytes), StandardCharsets.UTF_8)
    try {
      val out = Vector.newBuilder[(String, Array[Byte])]
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out += ((e.getName, zis.readAllBytes()))
        zis.closeEntry()
        e = zis.getNextEntry
      }
      out.result()
    } finally zis.close()
  }
}
