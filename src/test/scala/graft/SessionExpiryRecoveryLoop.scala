package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Session-gap twin of [[ExpiryRecoveryLoop]] (VERDICT r14 #7): the
  * dedup family is drilled at both determinism boundaries (survivor +
  * expiry) — this loop drills the SESSIONIZER's expiry boundary, the
  * one remaining state-expiry mechanism with only steady-state
  * recovery coverage.
  *
  * The boundary: a user's open session whose `end + gap` the
  * watermark has passed is closed either by the EventTimeTimeout
  * sweep (a batch with no data for that user) or by the DATA PATH
  * when the user's next event arrives first (`t - end > gap` is
  * guaranteed for any event that survived the watermark filter, since
  * `t >= wm > end + gap`). Which one fires depends on batch
  * granularity, and a restart legally changes that granularity — so
  * the emitted session set must be identical across every kill point
  * straddling the sweep batch, the re-arrival batch, and mid-commit
  * jitter. This loop kills the drain at varying points around that
  * boundary and asserts the exact session set every time (the
  * companion forced-coalesce spec in StreamingRecoverySpec pins the
  * same property against a deterministic two-files-per-batch
  * schedule).
  *
  * Usage: sbt "Test/runMain graft.SessionExpiryRecoveryLoop 100"
  */
object SessionExpiryRecoveryLoop {

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
    val srcDir = s"$root/events"
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
      .appName("session-expiry-recovery-loop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // gap 600 s, watermark delay 600 s. u7's session A ([100,200])
    // expires at 800 s; slice 1 (u9@2000) advances the watermark to
    // 1400 s past that boundary, so under one-file batches the sweep
    // closes A in slice 2's batch, while u7's post-expiry re-arrival
    // at 2300 s (slice 3) must open a NEW session B either way.
    // Slices 5/6 are far-future sentinel users whose only job is to
    // push the watermark past every real session's timeout so the
    // drain flushes them (u99 is filtered from the assertions).
    val gapUs = 600L * SecUs
    val slices = Seq(
      Seq((7L, 1L, 100L), (7L, 2L, 200L), (8L, 3L, 110L)),
      Seq((9L, 4L, 2000L)),
      Seq((9L, 5L, 2100L)),
      Seq((7L, 6L, 2300L)),
      Seq((8L, 7L, 2400L)),
      Seq((99L, -1L, 100000L)),
      Seq((99L, -2L, 300000L))
    ).map(s => s.map { case (u, e, sec) => (u, e, sec * SecUs) }
      .toDF("user_id", "event_id", "tus"))
    // (user, start_us, end_us, n_events); u99 excluded
    val expected = Set(
      (7L, 100L * SecUs, 200L * SecUs, 2L),
      (7L, 2300L * SecUs, 2300L * SecUs, 1L),
      (8L, 110L * SecUs, 110L * SecUs, 1L),
      (8L, 2400L * SecUs, 2400L * SecUs, 1L),
      (9L, 2000L * SecUs, 2100L * SecUs, 2L))

    var failures = 0
    for (attempt <- 1 to n) {
      val root = Files.createTempDirectory(s"session-expiry-loop-$attempt").toString
      val srcDir = writeSlices(spark, root, slices)

      def start(ckpt: String, out: String) = {
        val stream = spark.readStream
          .schema("user_id LONG, event_id LONG, tus LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .as[graft.streaming.StreamingSessionize.Event]
        graft.streaming.StreamingSessionize.sessionize(stream, gapUs,
            watermarkDelay = "10 minutes")
          .toDF()
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

      val ckpt = s"$root/ckpt"
      val out = s"$root/out"
      val q = start(ckpt, out)
      // concentrate kills on the boundary batches: the sweep fires in
      // batch 2, the post-expiry re-arrival lands in batch 3, the
      // second real session closes in 4 — plus sub-batch jitter so
      // the stop hits different commit phases
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
        val got = spark.read.parquet(out)
          .filter($"user_id" =!= 99L)
          .select($"user_id", $"session_start_us", $"session_end_us", $"n_events")
          .as[(Long, Long, Long, Long)].collect().toSeq
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
