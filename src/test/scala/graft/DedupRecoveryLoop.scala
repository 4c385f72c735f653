package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Forensic loop for the streaming first-arrival dedup kill+restart
  * drill (VERDICT r12 "what's wrong" #1: StreamingRecoverySpec's dedup
  * drill failed once — survivor 352 kept where 200 should have been,
  * i.e. the first arrival was missing from the recovered sink AND its
  * digest was absent from state when the later duplicate arrived).
  *
  * Runs the exact drill N times. Per attempt it logs the killed batch
  * id, the offset/commit-log frontier at the kill, and on a survivor
  * mismatch dumps the full checkpoint + sink-metadata listing and
  * PRESERVES the failing directory for inspection instead of deleting
  * it.
  *
  * Usage: sbt "Test/runMain graft.DedupRecoveryLoop 50"
  */
object DedupRecoveryLoop {

  private val SecUs = 1000000L

  private def ls(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Seq(s"(missing) $dir")
    val stream = Files.walk(p)
    try stream.iterator().asScala.map { f =>
      val size = if (Files.isRegularFile(f)) Files.size(f) else -1L
      s"${p.relativize(f)} ${if (size >= 0) s"${size}B" else "dir"}"
    }.toList.sorted
    finally stream.close()
  }

  private def writeSlices(spark: SparkSession, root: String,
                          slices: Seq[org.apache.spark.sql.DataFrame]): String = {
    val srcDir = s"$root/docs"
    new java.io.File(srcDir).mkdirs()
    slices.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$root/tmp_$i"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"slice_$i.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
      ()
    }
    srcDir
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dedup-recovery-loop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // identical corpus to the spec: slice i = 6 fresh contents + dups
    // of every prior slice's first content
    val slices = (0 until 8).map { i =>
      val fresh = (0 until 6).map { j =>
        (i * 100L + j, s"content ${i * 6 + j} body", i * 60L * SecUs + j * SecUs)
      }
      val dups = (0 until i).map { p =>
        (i * 100L + 50 + p, s"content ${p * 6} body", i * 60L * SecUs + 30 * SecUs + p * SecUs)
      }
      (fresh ++ dups).toDF("doc_id", "text", "tus")
    }
    // deterministic survivor set: the earliest-event-time IN-HORIZON
    // arrival of every content. Doc 0 (ts=0) is dropped as late by
    // Spark's stateful-operator watermark filter (initial watermark 0)
    // before the keep function ever sees it, so content 0's survivor
    // is deterministically doc 150 — slice 1's duplicate at ts=90s,
    // the earliest arrival the operator observes.
    val expected = (for (i <- 0 until 8; j <- 0 until 6)
      yield (i * 100L + j, s"content ${i * 6 + j} body")).toSet -
      ((0L, "content 0 body")) + ((150L, "content 0 body"))

    var failures = 0
    for (attempt <- 1 to n) {
      val root = Files.createTempDirectory(s"dedup-loop-$attempt").toString
      val srcDir = writeSlices(spark, root, slices)

      def start(ckpt: String, out: String) = {
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING, tus LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("tsc", timestamp_micros($"tus"))
        graft.streaming.StreamingDedup.dedupByContent(stream, "text", "tsc",
            tieBreakCol = Some("doc_id"))
          .select($"doc_id", $"text")
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

      val ckpt = s"$root/ckpt"
      val out = s"$root/out"
      val q = start(ckpt, out)
      // vary the kill point across attempts: wait for batch 1..5, plus
      // a sub-batch jitter so the stop lands at different phases of
      // the in-flight batch (mid-sink-write, mid-state-commit, …)
      val killAfter = 1 + (attempt % 5)
      val deadline = System.nanoTime() + 60L * 1000000000L
      while ((q.lastProgress == null || q.lastProgress.batchId < killAfter) &&
             q.isActive && System.nanoTime() < deadline) Thread.sleep(5)
      Thread.sleep((attempt * 7) % 50)
      val seenAtStop = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      q.stop()
      q.awaitTermination()
      val seenAfter = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      val offsets = ls(s"$ckpt/offsets").mkString(",")
      val commits = ls(s"$ckpt/commits").mkString(",")
      if (seenAfter >= slices.size - 1) {
        println(s"[$attempt] kill too late (batch $seenAfter) — skipped")
        deleteRec(Paths.get(root))
      } else {
        val q2 = start(ckpt, out)
        q2.awaitTermination()
        val got = spark.read.parquet(out).as[(Long, String)].collect().toSeq
        val ok = got.toSet == expected && got.size == got.toSet.size
        if (ok) {
          println(s"[$attempt] OK  killed@$seenAtStop->$seenAfter " +
            s"offsets=[$offsets] commits=[$commits]")
          deleteRec(Paths.get(root))
        } else {
          failures += 1
          println(s"[$attempt] FAIL killed@$seenAtStop->$seenAfter root=$root")
          println(s"  offsets=[$offsets]")
          println(s"  commits=[$commits]")
          val missing = expected -- got.toSet
          val extra = got.toSet -- expected
          println(s"  missing=${missing.toSeq.sorted.mkString(";")}")
          println(s"  extra=${extra.toSeq.sorted.mkString(";")}")
          val dupes = got.groupBy(identity).filter(_._2.size > 1).keys
          println(s"  dupes=${dupes.toSeq.sorted.mkString(";")}")
          println("  ckpt tree:")
          ls(ckpt).foreach(l => println(s"    $l"))
          println("  sink tree:")
          ls(out).foreach(l => println(s"    $l"))
        }
      }
    }
    println(s"done: $failures failures / $n attempts")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRec) finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }
}
