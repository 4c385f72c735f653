package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600L * 1000000

  test("first arrival survives; in-batch and cross-batch duplicates drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)] // (doc_id, text, tus)
    val docs = input.toDS().toDF("doc_id", "text", "tus")
      .withColumn("ts", timestamp_micros($"tus"))
    val out = StreamingDedup.dedupByContent(docs, "text", "ts")
    val query = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()

    // batch 1: two normalization-equal copies (punctuation differs) +
    // two distinct docs
    input.addData(
      (1L, "The quick brown fox!", Hour),
      (2L, "the QUICK brown fox??", Hour + 1),
      (3L, "something else entirely", Hour + 2),
      (4L, "a third unique document", Hour + 3))
    query.processAllAvailable()
    // batch 2: a cross-batch duplicate (of doc 3) inside the watermark
    // horizon + one genuinely new doc
    input.addData(
      (5L, "SOMETHING else, entirely...", Hour + 10),
      (6L, "fresh new content here", Hour + 11))
    query.processAllAvailable()
    query.stop()

    val survivors = spark.table("dedup_test")
      .select($"doc_id").as[Long].collect().toSet
    // doc 1 beats its IN-BATCH duplicate doc 2 deterministically (the
    // keep is min event time, not encounter order — the r13 contract
    // that makes the survivor independent of batch granularity);
    // 3 survives; 5 duplicates 3 cross-batch → dropped; 4 and 6
    // unique → survive
    assert(survivors.contains(1L) && !survivors.contains(2L),
      s"in-batch keep must be the earliest event time (got $survivors)")
    assert(survivors.contains(3L) && survivors.contains(4L) && survivors.contains(6L))
    assert(!survivors.contains(5L))

    // surviving CONTENT set equals the batch dedup of the same rows
    val all = Seq(
      (1L, "The quick brown fox!"), (2L, "the QUICK brown fox??"),
      (3L, "something else entirely"), (4L, "a third unique document"),
      (5L, "SOMETHING else, entirely..."), (6L, "fresh new content here"))
      .toDF("doc_id", "text")
    val batchHashes = all.select(Dedup.contentHash($"text").as("h"))
      .distinct().as[String].collect().toSet
    val streamedHashes = spark.table("dedup_test")
      .select(Dedup.contentHash($"text").as("h"))
      .as[String].collect().toSet
    assert(streamedHashes == batchHashes)
  }
}
