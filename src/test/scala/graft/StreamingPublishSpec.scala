package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingPublish

class StreamingPublishSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch publish lands per-batch partitions; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-pub").toString
    val out = s"$root/corpus"
    val ckpt = s"$root/ckpt"

    val input = MemoryStream[(Long, String, String)] // (doc_id, text, lang)
    val stream = input.toDS().toDF("doc_id", "text", "lang")
    val q = StreamingPublish.publishStream(stream, out, ckpt,
      partitionCols = Seq("lang"), sortBy = Seq("doc_id"),
      trigger = Trigger.ProcessingTime(0))

    input.addData((1L, "one", "en"), (2L, "zwei", "de"))
    q.processAllAvailable()
    input.addData((3L, "three", "en"), (4L, "cuatro", "es"))
    q.processAllAvailable()
    q.stop()

    val read1 = spark.read.parquet(out)
    assert(read1.count() === 4)
    // batch is a real partition column: b0 holds the first two rows
    assert(read1.filter($"batch" === "b0").select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(read1.filter($"batch" === "b1").count() === 2)
    // per-language layout under each batch
    assert(read1.filter($"lang" === "en").count() === 2)
    val snapshot = read1.orderBy("doc_id")
      .select("doc_id", "text", "lang", "batch")
      .as[(Long, String, String, String)].collect().toSeq

    // REPLAY batch 1 (at-least-once delivery: same id, same rows) —
    // dynamic partition overwrite must rewrite exactly batch=b1 and
    // leave the corpus byte-identical
    val replay = Seq((3L, "three", "en"), (4L, "cuatro", "es"))
      .toDF("doc_id", "text", "lang")
    StreamingPublish.publishBatch(replay, 1L, out,
      partitionCols = Seq("lang"), sortBy = Seq("doc_id"))
    val read2 = spark.read.parquet(out).orderBy("doc_id")
      .select("doc_id", "text", "lang", "batch")
      .as[(Long, String, String, String)].collect().toSeq
    assert(read2 === snapshot, "replaying a batch changed the corpus")

    // the partitionOverwriteMode conf was restored
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic") ||
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode").isEmpty)
  }

  test("the reserved batch column is rejected on the stream side") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDS().toDF("doc_id", "batch")
    intercept[IllegalArgumentException] {
      StreamingPublish.publishStream(stream, "/tmp/x", "/tmp/y", Seq("batch"))
    }
  }
}
