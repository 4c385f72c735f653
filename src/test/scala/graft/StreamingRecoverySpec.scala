package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{Event, Session}

/** Streaming crash-recovery drill (VERDICT r08 task #3b) — the
  * streaming twin of CheckpointsSpec's executor-loss drill: a drain is
  * KILLED mid-run after at least one committed micro-batch, restarted
  * from the same checkpoint, and must land exactly the sink an
  * uninterrupted run lands — no lost sessions, no duplicates. That is
  * the exactly-once-through-restart contract a 100 TB streaming
  * pipeline leans on: the offset log replays the uncommitted batch,
  * the state store restores the open sessions, and the file sink's
  * metadata log deduplicates any half-written output.
  *
  * Batch determinism: the source files carry strictly increasing
  * modification times and `maxFilesPerTrigger = 1`, so both runs see
  * the SAME file-per-batch schedule (the restart reads it back from
  * the offset log), the watermark climbs chronologically, and the
  * sentinel file (far-future user, filtered from the result) lands in
  * the final batch where it flushes every open session.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60L * 1000000

  test("mid-drain kill + restart from the same checkpoint equals an uninterrupted run") {
    val root = Files.createTempDirectory("graft-stream-recovery").toString
    val srcDir = s"$root/src"
    new java.io.File(srcDir).mkdirs()

    // 5 chronological slices: 8 users × sessions spread over hours,
    // every user's events event-time ordered ACROSS slices (the
    // regime where streaming ≡ batch), plus a sentinel slice far in
    // the future that flushes all remaining open sessions.
    val base = 1440 * Min
    val events = for {
      u <- 0L until 8L
      s <- 0 until 3 // 3 sessions per user, 90 min apart
      e <- 0 until 4 // 4 events per session, 5 min apart
    } yield Event(u, u * 100 + s * 10 + e, base + s * 90 * Min + e * 5 * Min + u * Min)
    val slices = events.sortBy(_.tus).grouped(events.size / 5 + 1).toSeq
    val allFiles = slices :+ Seq(Event(-1L, -1L, base + 100000 * Min),
      Event(-1L, -2L, base + 200000 * Min))
    allFiles.zipWithIndex.foreach { case (rows, i) =>
      // the file stream source lists one level — land each slice as a
      // FLAT file under srcDir, with strictly increasing mtimes to pin
      // the file-per-batch schedule
      val tmp = s"$root/tmp_$i"
      rows.toDF().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(srcDir, s"slice_$i.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
      ()
    }

    def drain(tag: String, interrupt: Boolean): Long = {
      val ckpt = s"$root/ckpt_$tag"
      val out = s"$root/out_$tag"
      def start() = {
        val stream = spark.readStream
          .schema("user_id LONG, event_id LONG, tus LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
        StreamingSessionize.sessionize(stream.as[Event], gapUs = 30 * Min)
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }
      val q = start()
      if (interrupt) {
        // wait for ≥1 COMMITTED batch, then kill mid-drain
        val deadline = System.nanoTime() + 60L * 1000000000L
        while ((q.lastProgress == null || q.lastProgress.batchId < 1) &&
               q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
        val seen = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
        q.stop()
        q.awaitTermination()
        assert(seen >= 1, s"never saw a committed batch before the kill (last=$seen)")
        assert(seen < allFiles.size - 1,
          s"drain already finished (batch $seen of ${allFiles.size}) — kill came too late")
        // restart from the same checkpoint; AvailableNow drains the rest
        val q2 = start()
        q2.awaitTermination()
        assert(q2.lastProgress.batchId > seen,
          "restart did not advance past the killed run's last batch")
      } else q.awaitTermination()
      spark.read.parquet(out).as[Session].filter(_.user_id >= 0).count()
    }

    val clean = {
      val ckpt = s"$root/ckpt_clean"; val _ = ckpt
      drain("clean", interrupt = false)
    }
    val recovered = drain("recovered", interrupt = true)

    val cleanRows = spark.read.parquet(s"$root/out_clean").as[Session]
      .filter(_.user_id >= 0).collect().toSet
    val recoveredRows = spark.read.parquet(s"$root/out_recovered").as[Session]
      .filter(_.user_id >= 0).collect().toSet
    assert(clean == 8 * 3, s"clean run emitted $clean sessions, expected 24")
    assert(recoveredRows == cleanRows,
      "restarted drain's sink differs from the uninterrupted run")
    // exactly-once: no duplicate session rows survived the replay
    assert(recovered == recoveredRows.size,
      "duplicate rows in the recovered sink — file-sink log failed to dedupe")
  }
}
