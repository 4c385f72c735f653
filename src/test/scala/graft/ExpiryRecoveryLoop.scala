package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Forensic loop for the streaming dedup EXPIRY-BOUNDARY drill
  * (VERDICT r13 #7): the within-horizon survivor drill
  * ([[DedupRecoveryLoop]], 0/120 after the r13 min-event-time fix)
  * never exercised the watermark-expiry path — a duplicate arriving
  * AFTER its digest's state expired, which must legally RE-EMIT, with
  * the kill landing across the expiry boundary.
  *
  * The specific hazard: EventTimeTimeout sweeps a group only in a
  * batch where it has no data, so a restart that coalesces the
  * would-be sweep batch with the re-arrival's batch sees
  * `state.exists == true` for an entry the watermark has already
  * passed. An exists-based keep then DROPS the re-arrival that the
  * split-batch schedule re-emits — survivor set depends on batch
  * granularity, the r13 bug's expiry twin. The operator compares the
  * stored expiry against the current watermark instead
  * (StreamingDedup.scala); this loop kills the drain at varying
  * points around the boundary (the sweep batch, the re-emit batch,
  * mid-state-commit jitter) and asserts the exact survivor set
  * including the re-emitted row every time.
  *
  * Usage: sbt "Test/runMain graft.ExpiryRecoveryLoop 100"
  */
object ExpiryRecoveryLoop {

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
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("expiry-recovery-loop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Same timeline as StreamingRecoverySpec's expiry test (delay
    // 600 s): "dup body" kept at t=100 s, in-horizon duplicate at
    // 300 s dropped (expiry extended to 900 s), slices 2/3 advance the
    // watermark to 1600 s past the boundary, slice-4 duplicate at
    // 2300 s re-emits. Batches 3 (sweep) and 4 (re-emit) are the
    // boundary the kills straddle.
    val slices = Seq(
      Seq((0L, "dup body", 100L), (1L, "y0 body", 110L)),
      Seq((100L, "dup body", 300L), (101L, "y1 body", 310L)),
      Seq((200L, "y2 body", 2000L)),
      Seq((300L, "y3 body", 2200L)),
      Seq((400L, "dup body", 2300L), (401L, "y4 body", 2310L))
    ).map(s => s.map { case (id, t, sec) => (id, t, sec * SecUs) }
      .toDF("doc_id", "text", "tus"))
    val expected = Set(
      (0L, "dup body"), (1L, "y0 body"), (101L, "y1 body"),
      (200L, "y2 body"), (300L, "y3 body"),
      (400L, "dup body"), (401L, "y4 body"))

    var failures = 0
    for (attempt <- 1 to n) {
      val root = Files.createTempDirectory(s"expiry-loop-$attempt").toString
      val srcDir = writeSlices(spark, root, slices)

      def start(ckpt: String, out: String) = {
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING, tus LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("tsc", timestamp_micros($"tus"))
        graft.streaming.StreamingDedup.dedupByContent(stream, "text", "tsc",
            watermarkDelay = "10 minutes", tieBreakCol = Some("doc_id"))
          .select($"doc_id", $"text")
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

      val ckpt = s"$root/ckpt"
      val out = s"$root/out"
      val q = start(ckpt, out)
      // concentrate kills on the boundary batches: wait for batch 2,
      // 3 or 4 (the sweep fires in 3, the re-emit lands in 4), plus
      // sub-batch jitter so the stop hits different commit phases
      val killAfter = 2 + (attempt % 3)
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
          println(s"  missing=${(expected -- got.toSet).toSeq.sorted.mkString(";")}")
          println(s"  extra=${(got.toSet -- expected).toSeq.sorted.mkString(";")}")
          println(s"  dupes=${got.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted.mkString(";")}")
          println("  ckpt tree:")
          ls(ckpt).foreach(l => println(s"    $l"))
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
