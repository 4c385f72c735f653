package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming exact deduplication — the streaming twin of the batch
  * `d01`/`d02` queries (same canonicalization + 128-bit digest).
  *
  * The FIRST arrival of each content digest is emitted; later copies
  * arriving within the watermark horizon are dropped. Built on
  * `dropDuplicatesWithinWatermark`, so state holds one entry per
  * DISTINCT digest seen inside the horizon and expires with the
  * watermark — at 100 TB/day the state tracks unique-content
  * cardinality per horizon, never event volume, and the digest is
  * 16 bytes regardless of document size (the raw text never enters
  * state).
  *
  * Contract vs batch: batch `exactKeepIds` keeps the MIN id per
  * group; streaming keeps the FIRST ARRIVAL. The surviving content
  * set is identical; which representative survives differs when a
  * larger id arrives first. A duplicate arriving AFTER the watermark
  * has expired its digest's state re-emits (exactly-once dedup only
  * within the horizon) — widen the delay to widen the guarantee.
  */
object StreamingDedup {

  /** docs must carry an event-time timestamp column `tsCol`. Output:
    * the input rows that survived dedup, original schema preserved. */
  def dedupByContent(docs: DataFrame, textCol: String, tsCol: String,
                     watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("_content_h", Dedup.contentHash(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_content_h")
      .drop("_content_h")
}
