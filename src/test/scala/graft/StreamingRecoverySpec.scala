package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
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

    def drain(tag: String, interrupt: Boolean): String =
      drainWithKill(root, tag, allFiles.size, interrupt) { (ckpt, out) =>
        val stream = spark.readStream
          .schema("user_id LONG, event_id LONG, tus LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
        StreamingSessionize.sessionize(stream.as[Event], gapUs = 30 * Min)
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

    val cleanOut = drain("clean", interrupt = false)
    val recoveredOut = drain("recovered", interrupt = true)
    val clean = spark.read.parquet(cleanOut).as[Session]
      .filter(_.user_id >= 0).count()
    val recovered = spark.read.parquet(recoveredOut).as[Session]
      .filter(_.user_id >= 0).count()

    val cleanRows = spark.read.parquet(cleanOut).as[Session]
      .filter(_.user_id >= 0).collect().toSet
    val recoveredRows = spark.read.parquet(recoveredOut).as[Session]
      .filter(_.user_id >= 0).collect().toSet
    assert(clean == 8 * 3, s"clean run emitted $clean sessions, expected 24")
    assert(recoveredRows == cleanRows,
      "restarted drain's sink differs from the uninterrupted run")
    // exactly-once: no duplicate session rows survived the replay
    assert(recovered == recoveredRows.size,
      "duplicate rows in the recovered sink — file-sink log failed to dedupe")
  }

  // ---- shared drill machinery for the r10 state-shape drills ------------

  /** Land `slices` as one flat parquet file each under
    * `<root>/<srcName>`, with strictly increasing mtimes so
    * `maxFilesPerTrigger = 1` pins the same file-per-batch schedule on
    * every (re)start. */
  private def writeSlices(root: String, srcName: String,
                          slices: Seq[org.apache.spark.sql.DataFrame]): String = {
    val srcDir = s"$root/$srcName"
    new java.io.File(srcDir).mkdirs()
    slices.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$root/tmp_${srcName}_$i"
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

  /** One drain to a parquet sink; when `interrupt`, kill after ≥1
    * committed batch but before the last, then restart from the SAME
    * checkpoint and drain to completion. Returns the sink path.
    *
    * The kill is a race against the drain: on a fast machine the
    * AvailableNow drain can commit every remaining batch before
    * `stop()` lands (ADVICE r10 — a spurious "kill came too late"
    * failure). A too-late kill therefore RETRIES with a fresh
    * checkpoint + sink (up to 5 attempts) instead of asserting; only
    * exhausting the attempts fails the drill. */
  private def drainWithKill(root: String, tag: String, totalBatches: Int,
                            interrupt: Boolean)(
      start: (String, String) => org.apache.spark.sql.streaming.StreamingQuery): String = {
    if (!interrupt) {
      val out = s"$root/out_$tag"
      start(s"$root/ckpt_$tag", out).awaitTermination()
      return out
    }
    val maxAttempts = 5
    var attempt = 0
    while (attempt < maxAttempts) {
      val suffix = if (attempt == 0) tag else s"${tag}_retry$attempt"
      val ckpt = s"$root/ckpt_$suffix"
      val out = s"$root/out_$suffix"
      val q = start(ckpt, out)
      val deadline = System.nanoTime() + 60L * 1000000000L
      while ((q.lastProgress == null || q.lastProgress.batchId < 1) &&
             q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
      val seen = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      q.stop()
      q.awaitTermination()
      assert(seen >= 1, s"never saw a committed batch before the kill (last=$seen)")
      if (seen < totalBatches - 1) {
        val q2 = start(ckpt, out)
        q2.awaitTermination()
        assert(q2.lastProgress.batchId > seen,
          "restart did not advance past the killed run's last batch")
        return out
      }
      info(s"kill landed after the drain finished (batch $seen of $totalBatches); retrying")
      attempt += 1
    }
    fail(s"kill never landed mid-drain in $maxAttempts attempts — widen the batch schedule")
  }

  /** Join-BUFFER state shape (VERDICT r09 #4): the stream-stream
    * banded range join (e07's operator) holds each side's rows inside
    * the watermark band in state. The kill lands between committed
    * batches, so the restart must restore both buffers from the state
    * store — a lost buffered view would silently drop matched pairs,
    * a replayed one would duplicate them. */
  test("stream-stream range join: kill + restart equals uninterrupted run") {
    val root = Files.createTempDirectory("graft-rangejoin-recovery").toString
    val MinUs = 60L * 1000000
    val base = 1440 * MinUs
    // per user: 12 views 10 min apart, purchases at +30 and +90 min.
    // band [-1 h, 0]: purchase@30 matches views k=0..3, purchase@90
    // matches k=3..9 → 11 pairs per user, 44 total.
    val rows = for {
      u <- 0L until 4L
      (tpe, id, tus) <- (0 until 12).map(k =>
          ("view", u * 1000 + k, base + k * 10 * MinUs)) ++
        Seq(("purchase", u * 100, base + 30 * MinUs),
            ("purchase", u * 100 + 1, base + 90 * MinUs))
    } yield (u, id, tpe, tus)
    val slices = rows.sortBy(_._4).grouped(rows.size / 8 + 1).toSeq
      .map(_.toDF("user_id", "event_id", "event_type", "tus"))
    val srcDir = writeSlices(root, "events", slices)

    def drain(tag: String, interrupt: Boolean): String =
      drainWithKill(root, tag, slices.size, interrupt) { (ckpt, out) =>
        def stream() = spark.readStream
          .schema("user_id LONG, event_id LONG, event_type STRING, tus LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
        def side(t: String, idAs: String, tusAs: String) = stream()
          .filter($"event_type" === t)
          .select($"user_id", $"event_id".as(idAs), $"tus".as(tusAs))
        val pairs = graft.streaming.StreamingRangeJoin.rangeJoin(
          side("purchase", "purchase_id", "ptus"),
          side("view", "view_id", "vtus"),
          Seq("user_id"), leftTime = "ptus", rightTime = "vtus",
          lowerUs = -3600000000L, upperUs = 0L)
        pairs.select($"purchase_id", $"view_id")
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

    val cleanOut = drain("clean", interrupt = false)
    val recoveredOut = drain("recovered", interrupt = true)
    val clean = spark.read.parquet(cleanOut)
      .as[(Long, Long)].collect().toSeq
    val recovered = spark.read.parquet(recoveredOut)
      .as[(Long, Long)].collect().toSeq
    assert(clean.size == 44 && clean.toSet.size == 44,
      s"clean run emitted ${clean.size} pairs (${clean.toSet.size} distinct), expected 44")
    assert(recovered.toSet == clean.toSet,
      "restarted range-join sink differs from the uninterrupted run")
    assert(recovered.size == recovered.toSet.size,
      "duplicate pairs in the recovered sink — join state or sink log replayed rows")
  }

  /** KV-with-eviction state shape (VERDICT r09 #4): first-arrival
    * dedup (d06's operator) keys state by content digest and keeps the
    * EARLIEST event-time arrival, so the survivor set is deterministic
    * even when a restart re-plans the killed batch and COALESCES two
    * source files into one micro-batch — the exact failure r12's flake
    * exposed (the torn `offsets/b` entry made the restarted batch span
    * two slices, and the old dropDuplicatesWithinWatermark path kept
    * an arbitrary in-batch row; DedupRecoveryLoop reproduced it 15/100
    * before the r13 operator fix, 0 after). The restart must restore
    * the seen-digest store or a post-kill duplicate would re-emit. */
  test("streaming first-arrival dedup: kill + restart equals uninterrupted run") {
    val root = Files.createTempDirectory("graft-dedup-recovery").toString
    val SecUs = 1000000L
    // slice i carries: dups of every PRIOR slice's content, plus 6 new
    // contents. 8 slices × 6 = 48 distinct contents; ids are unique.
    val slices = (0 until 8).map { i =>
      val fresh = (0 until 6).map { j =>
        (i * 100L + j, s"content ${i * 6 + j} body", i * 60L * SecUs + j * SecUs)
      }
      val dups = (0 until i).map { p =>
        (i * 100L + 50 + p, s"content ${p * 6} body", i * 60L * SecUs + 30 * SecUs + p * SecUs)
      }
      (fresh ++ dups).toDF("doc_id", "text", "tus")
    }
    val srcDir = writeSlices(root, "docs", slices)

    def drain(tag: String, interrupt: Boolean): String =
      drainWithKill(root, tag, slices.size, interrupt) { (ckpt, out) =>
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

    val cleanOut = drain("clean", interrupt = false)
    val recoveredOut = drain("recovered", interrupt = true)
    val clean = spark.read.parquet(cleanOut).as[(Long, String)].collect().toSeq
    val recovered = spark.read.parquet(recoveredOut).as[(Long, String)].collect().toSeq
    // survivors: exactly the 48 first arrivals (deterministic ids)
    assert(clean.size == 48 && clean.map(_._2).toSet.size == 48,
      s"clean run kept ${clean.size} rows / ${clean.map(_._2).toSet.size} contents, expected 48/48")
    assert(recovered.toSet == clean.toSet,
      "restarted dedup sink differs from the uninterrupted run")
    assert(recovered.size == recovered.toSet.size,
      "duplicate survivors in the recovered sink — digest state was lost across restart")
  }

  /** Expiry-boundary twin of the dedup drill (VERDICT r13 #7): a
    * duplicate that arrives AFTER the watermark passed its digest's
    * stored expiry must RE-EMIT (dedup is exactly-once only within
    * the horizon), and that decision must not depend on micro-batch
    * granularity. The trap: EventTimeTimeout only sweeps a group in a
    * batch where it has NO data, so when the re-arrival's batch
    * coalesces with the would-be sweep batch (a restart legally does
    * this; `maxFilesPerTrigger = 2` forces it deterministically), the
    * stale entry still `exists` — an exists-based keep would DROP the
    * re-arrival that the split-batch schedule re-emits. The operator
    * compares stored expiry against the current watermark instead
    * (StreamingDedup.scala), so all three drains below must agree. */
  test("dedup expiry-boundary re-emit: batch-granularity independent and kill-safe") {
    val root = Files.createTempDirectory("graft-dedup-expiry").toString
    val SecUs = 1000000L
    // delay 600 s. "dup body" first arrives at t=100 s (slice 0, kept),
    // duplicates at t=300 s (slice 1: inside horizon — dropped, expiry
    // extended to 900 s) and t=2300 s (slice 4: the watermark is
    // 1600 s ≥ expiry 900 s by then — legal re-emit). Slices 2/3 carry
    // only fresh content whose event times (2000/2200 s) advance the
    // watermark past the boundary; under maxFilesPerTrigger=1 the
    // sweep fires in batch 3 (no dup data), under =2 it never fires
    // before the re-arrival — the two schedules must still agree.
    val slices = Seq(
      Seq((0L, "dup body", 100L), (1L, "y0 body", 110L)),
      Seq((100L, "dup body", 300L), (101L, "y1 body", 310L)),
      Seq((200L, "y2 body", 2000L)),
      Seq((300L, "y3 body", 2200L)),
      Seq((400L, "dup body", 2300L), (401L, "y4 body", 2310L))
    ).map(s => s.map { case (id, t, sec) => (id, t, sec * SecUs) }
      .toDF("doc_id", "text", "tus"))
    val srcDir = writeSlices(root, "docs", slices)
    val expected = Set(
      (0L, "dup body"), (1L, "y0 body"), (101L, "y1 body"),
      (200L, "y2 body"), (300L, "y3 body"),
      (400L, "dup body"), (401L, "y4 body"))

    def drain(tag: String, interrupt: Boolean, filesPerTrigger: Int): String =
      drainWithKill(root, tag, slices.size / filesPerTrigger, interrupt) { (ckpt, out) =>
        val stream = spark.readStream
          .schema("doc_id LONG, text STRING, tus LONG")
          .option("maxFilesPerTrigger", filesPerTrigger.toString)
          .parquet(srcDir)
          .withColumn("tsc", timestamp_micros($"tus"))
        graft.streaming.StreamingDedup.dedupByContent(stream, "text", "tsc",
            watermarkDelay = "10 minutes", tieBreakCol = Some("doc_id"))
          .select($"doc_id", $"text")
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

    for ((tag, interrupt, fpt) <- Seq(("clean", false, 1),
                                      ("coalesced", false, 2),
                                      ("recovered", true, 1))) {
      val got = spark.read.parquet(drain(tag, interrupt, fpt))
        .as[(Long, String)].collect().toSeq
      assert(got.toSet == expected,
        s"$tag drain survivor set differs: missing=${expected -- got.toSet} " +
          s"extra=${got.toSet -- expected}")
      assert(got.size == expected.size,
        s"$tag drain emitted duplicates: ${got.groupBy(identity).filter(_._2.size > 1).keys}")
    }
  }

  /** Session-gap twin of the dedup expiry drill (VERDICT r14 #7): an
    * open session whose `end + gap` the watermark has passed is closed
    * either by the EventTimeTimeout SWEEP (a batch with no data for
    * that user) or by the DATA PATH when the user's next event lands
    * first — which one fires depends on micro-batch granularity, and a
    * restart legally changes that granularity (`maxFilesPerTrigger=2`
    * forces the coalesced schedule deterministically: the re-arrival
    * shares a batch with what would have been the sweep batch). The
    * emitted session set — boundaries, counts, no duplicates — must be
    * identical across all three schedules. SessionExpiryRecoveryLoop
    * is the ≥100-attempt randomized-kill companion. */
  test("sessionize expiry-boundary close: batch-granularity independent and kill-safe") {
    val root = Files.createTempDirectory("graft-session-expiry").toString
    val SecUs = 1000000L
    val gapUs = 600L * SecUs
    // gap 600 s: u7's session A [100,200] expires at 800 s; u9@2000
    // advances the watermark to 1400 s past the boundary, so under
    // one-file batches the sweep closes A in the next u7-less batch,
    // while u7's post-expiry re-arrival at 2300 s must open a NEW
    // session either way. u99 is a far-future sentinel pair that
    // flushes every real session (filtered from the assertions).
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
    val srcDir = writeSlices(root, "events", slices)
    val expected = Set(
      (7L, 100L * SecUs, 200L * SecUs, 2L),
      (7L, 2300L * SecUs, 2300L * SecUs, 1L),
      (8L, 110L * SecUs, 110L * SecUs, 1L),
      (8L, 2400L * SecUs, 2400L * SecUs, 1L),
      (9L, 2000L * SecUs, 2100L * SecUs, 2L))

    def drain(tag: String, interrupt: Boolean, filesPerTrigger: Int): String =
      drainWithKill(root, tag, slices.size / filesPerTrigger, interrupt) { (ckpt, out) =>
        val stream = spark.readStream
          .schema("user_id LONG, event_id LONG, tus LONG")
          .option("maxFilesPerTrigger", filesPerTrigger.toString)
          .parquet(srcDir)
          .as[graft.streaming.StreamingSessionize.Event]
        graft.streaming.StreamingSessionize.sessionize(stream, gapUs,
            watermarkDelay = "10 minutes")
          .toDF()
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

    for ((tag, interrupt, fpt) <- Seq(("clean", false, 1),
                                      ("coalesced", false, 2),
                                      ("recovered", true, 1))) {
      val got = spark.read.parquet(drain(tag, interrupt, fpt))
        .filter($"user_id" =!= 99L)
        .select($"user_id", $"session_start_us", $"session_end_us", $"n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got.toSet == expected,
        s"$tag drain session set differs: missing=${expected -- got.toSet} " +
          s"extra=${got.toSet -- expected}")
      assert(got.size == expected.size,
        s"$tag drain emitted duplicate sessions: " +
          s"${got.groupBy(identity).filter(_._2.size > 1).keys}")
    }
  }

  /** e19's anomaly contract under fault (VERDICT r09 #8): the
    * trailing-baseline verdict runs over the DRAINED windowed-count
    * frame, so it must be bit-stable whether or not the drain was
    * killed and restarted — an interrupted drain that lost or doubled
    * a window's count would flip lift_ppm and the verdict. */
  test("windowed counts + trailing-baseline anomaly verdict stable across kill + restart") {
    val root = Files.createTempDirectory("graft-anomaly-recovery").toString
    val HourUs = 3600L * 1000000
    val base = 24 * HourUs
    // type "a": steady 4/window with a 48-event spike in window 7
    // (lift 12e6 ppm → anomaly); type "b": steady 5/window (1e6 ppm).
    val counts = Map("a" -> ((w: Int) => if (w == 7) 48 else 4),
                     "b" -> ((_: Int) => 5))
    val rows = for {
      (tpe, f) <- counts.toSeq
      w <- 0 until 10
      j <- 0 until f(w)
    } yield (tpe, base + w * HourUs + j * 10L * 1000000)
    // sentinel far-future rows push the watermark past every real
    // window end (append mode emits a window only once it is closed)
    val sentinel = Seq(("zzz_sentinel", base + 1000 * HourUs),
                       ("zzz_sentinel", base + 2000 * HourUs))
    val slices = (rows.sortBy(_._2).grouped(rows.size / 7 + 1).toSeq ++
      Seq(sentinel)).map(_.toDF("event_type", "tus"))
    val srcDir = writeSlices(root, "events", slices)

    def drain(tag: String, interrupt: Boolean): String =
      drainWithKill(root, tag, slices.size, interrupt) { (ckpt, out) =>
        spark.readStream
          .schema("event_type STRING, tus LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir)
          .withColumn("tsc", timestamp_micros($"tus"))
          .withWatermark("tsc", "30 minutes")
          .groupBy(window($"tsc", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"))
          .select(unix_micros($"window.start").as("window_start_us"),
            $"event_type", $"n")
          .writeStream.format("parquet")
          .option("checkpointLocation", ckpt).option("path", out)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
      }

    // e19's exact trailing-baseline projection over a drained sink
    def anomalies(out: String): Set[(Long, String, Long, Long, Long, Long)] = {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"window_start_us")
        .rowsBetween(-6, -1)
      spark.read.parquet(out)
        .filter($"event_type" =!= "zzz_sentinel")
        .withColumn("baseline_n", sum($"n").over(win))
        .withColumn("_prior", count(lit(1)).over(win))
        .filter($"_prior" === 6)
        .select($"window_start_us", $"event_type", $"n", $"baseline_n",
          expr("(n * 6 * 1000000L) div baseline_n").as("lift_ppm"))
        .withColumn("is_anomaly",
          ($"lift_ppm" >= 2000000L || $"lift_ppm" <= 500000L).cast("long"))
        .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    }

    val clean = anomalies(drain("clean", interrupt = false))
    val recovered = anomalies(drain("recovered", interrupt = true))
    assert(clean.exists(_._6 == 1L), "the planted spike produced no anomaly verdict")
    // the spike itself reads hot, and it inflates the trailing
    // baselines of the two windows that still see it → two cold
    // verdicts follow (windows 8, 9 have baseline 68 vs n=4)
    assert(clean.count(_._6 == 1L) == 3,
      s"expected spike + 2 baseline-shadow anomalies, got ${clean.count(_._6 == 1L)}")
    assert(recovered == clean,
      "anomaly verdicts changed when the drain was interrupted — " +
        "windowed-count state did not survive the restart intact")
  }
}
