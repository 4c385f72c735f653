package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** The reference's flagship pipeline — bigram frequency counts over a
  * text corpus (`src/main/java/WordCountV2.java`) — as one declarative
  * Catalyst plan: scan → sanitize → tokenize → bigram-explode →
  * groupBy.count → (optionally key-sorted) TSV sink.
  *
  * Two record granularities, both observable in the reference's golden
  * outputs (SURVEY.md §5.2):
  *  - [[RecordMode.Lines]]  — one record per text line; bigrams never
  *    span newlines (`bigram_custom9`, the committed `TextInputFormat`
  *    pipeline).
  *  - [[RecordMode.WholeFiles]] — one record per file / ZIP entry;
  *    bigrams span line boundaries (`bigram_custom8`).
  *
  * Scale notes (100 TB posture):
  *  - Everything upstream of the aggregation fuses into one
  *    whole-stage-codegen pipeline; the only shuffle is the groupBy, and
  *    Spark's partial aggregation combines map-side — strictly less
  *    shuffle I/O than the reference, which set no combiner and shuffled
  *    every (bigram, 1) pair (`WordCountV2.java:44-57`).
  *  - Skew: bigram keys are Zipf-ish but partial agg collapses the heavy
  *    hitters map-side, so no salting is needed for counts.
  */
object Bigrams {

  sealed trait RecordMode
  object RecordMode {
    case object Lines      extends RecordMode
    case object WholeFiles extends RecordMode
  }

  /** Read a text corpus as records of the given granularity → `value: string`. */
  def readText(spark: SparkSession, path: String, mode: RecordMode): DataFrame =
    mode match {
      case RecordMode.Lines      => spark.read.text(path)
      case RecordMode.WholeFiles => spark.read.option("wholetext", "true").text(path)
    }

  /** Read a ZIP corpus as records of the given granularity — via the
    * DSv2 `zip-entries` source: entry-granular splits planned from
    * each archive's central directory, per-entry streamed decompress,
    * no whole-archive buffering (the [[ZipEntries]] binaryFile route
    * plans one partition per archive and caps archives at 2 GB). */
  def readZip(spark: SparkSession, path: String, mode: RecordMode): DataFrame = {
    val text = spark.read.format("zip-entries").load(path)
      .select(decode(col("content"), "UTF-8").as("value"))
    mode match {
      case RecordMode.WholeFiles => text
      case RecordMode.Lines =>
        text.select(explode(split(col("value"), "\r?\n")).as("value"))
    }
  }

  /** `records[textCol] → (bigram: string, count: long)`.
    *
    * Tokens are materialized to their own column before the bigram
    * transform: higher-order-function lambdas evaluate interpreted, so
    * an `element_at(tokenize(...), i)` inside the lambda would re-run
    * the full regex tokenization per array element — O(len²) per
    * record. Against a bound attribute it is O(1). */
  def counts(records: DataFrame, textCol: String = "value"): DataFrame =
    records
      .select(tokenize(col(textCol)).as("tokens"))
      .select(explode(bigrams(col("tokens"))).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("count"))

  /** End-to-end: corpus path → bigram counts. */
  def fromTextFiles(spark: SparkSession, path: String,
                    mode: RecordMode = RecordMode.Lines): DataFrame =
    counts(readText(spark, path, mode))

  def fromZip(spark: SparkSession, path: String,
              mode: RecordMode = RecordMode.Lines): DataFrame =
    counts(readZip(spark, path, mode))

  /** TSV sink matching the reference's output contract
    * (`WordCountV2.java:51-53`): `key \t value` lines, `part-*` files +
    * `_SUCCESS`, keys sorted within each partition (MapReduce's shuffle
    * sort made that implicit; here it is explicit and only at the sink). */
  def writeTsv(df: DataFrame, outDir: String, numPartitions: Int = 32,
               sortCols: Seq[String] = Seq("bigram")): Unit = {
    val cols = df.columns.map(col)
    df.repartition(numPartitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .select(concat_ws("\t", cols: _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(outDir)
  }
}
