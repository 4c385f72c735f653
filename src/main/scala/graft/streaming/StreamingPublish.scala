package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.CorpusSink

/** Streaming publish into the partitioned corpus layout — the ingest
  * path of a continuously-growing training corpus, built on
  * `foreachBatch` + [[CorpusSink]] so the stream gets the SAME
  * small-files / hot-partition / row-group-sort treatment as batch
  * publishes.
  *
  * Exactly-once without a transactional sink: Structured Streaming
  * guarantees `foreachBatch` sees each batch id at-least-once with
  * identical contents, so idempotent-by-batch-id writes make the sink
  * effectively exactly-once. Every batch lands under its own
  * `batch=b<N>` partition value and the write runs with DYNAMIC
  * partition overwrite — a replayed batch OVERWRITES precisely the
  * partitions it wrote the first time and touches nothing else. No
  * delete-and-rewrite of the corpus root, no manifest service; the
  * idempotence key is in the directory layout itself, which any
  * engine (or a human with `ls`) can audit.
  *
  * Readers treat `batch` as an ordinary partition column: corpus-wide
  * scans read through it, incremental consumers pin `batch=bN` ranges
  * — partition pruning on ingest generation for free.
  */
object StreamingPublish {

  /** Idempotently publish one micro-batch: rows land under
    * `batch=b<batchId>/<partitionCols…>` with dynamic partition
    * overwrite, via [[CorpusSink.writeParquet]]. The overwrite mode is
    * a PER-WRITE DataFrameWriter option, never a session-conf
    * mutation: a set/restore around the write would race with any
    * concurrent partitioned overwrite on the same session, and losing
    * that race means running this Overwrite under STATIC mode — which
    * deletes every previously published batch under `outDir`. */
  def publishBatch(batch: DataFrame, batchId: Long, outDir: String,
                   partitionCols: Seq[String],
                   filesPerPart: Int = 1,
                   maxRecordsPerFile: Long = 1000000L,
                   sortBy: Seq[String] = Nil): Unit =
    CorpusSink.writeParquet(
      batch.withColumn("batch", concat(lit("b"), lit(batchId))),
      outDir, "batch" +: partitionCols,
      filesPerPart = filesPerPart, maxRecordsPerFile = maxRecordsPerFile,
      sortBy = sortBy, mode = SaveMode.Overwrite,
      writerOptions = Map("partitionOverwriteMode" -> "dynamic"))

  /** Start the publishing stream (caller picks the trigger; bounded
    * drains use AvailableNow). The `batch` column is reserved for the
    * sink's idempotence key. */
  def publishStream(stream: DataFrame, outDir: String, ckptDir: String,
                    partitionCols: Seq[String],
                    filesPerPart: Int = 1,
                    maxRecordsPerFile: Long = 1000000L,
                    sortBy: Seq[String] = Nil,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(!stream.columns.contains("batch"),
      "publishStream: the 'batch' column is reserved for the sink's idempotence key")
    stream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        publishBatch(b, id, outDir, partitionCols,
          filesPerPart, maxRecordsPerFile, sortBy)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(trigger)
      .start()
  }
}
