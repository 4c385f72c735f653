package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FEvent

class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600L * 1000000

  private def run(batches: Seq[Seq[FEvent]],
                  stages: Seq[String]): Map[Long, Seq[Option[Long]]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FEvent]
    val out = StreamingFunnel.stageReaches(input.toDS(), stages,
      horizonUs = 10 * Hour, watermarkDelay = "1 minute")
    val name = s"funnel_test_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // two far-future flush batches: advance the watermark past every
      // horizon, then fire the timeouts
      input.addData(FEvent(-1L, "__x", 1000 * Hour)); q.processAllAvailable()
      input.addData(FEvent(-1L, "__x", 2000 * Hour)); q.processAllAvailable()
      spark.table(name).as[(Long, Int, Option[Long])].collect()
        .filter(_._1 >= 0)
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    } finally q.stop()
  }

  test("in-batch fold matches sequential minima, including out-of-order stages") {
    val got = run(Seq(Seq(
      FEvent(1, "A", Hour), FEvent(1, "B", 2 * Hour), FEvent(1, "C", 3 * Hour),
      FEvent(2, "B", Hour), FEvent(2, "A", 2 * Hour),       // B before A: no B
      FEvent(3, "C", Hour)                                  // never enters
    )), Seq("A", "B", "C"))
    assert(got === Map(
      1L -> Seq(Some(Hour), Some(2 * Hour), Some(3 * Hour)),
      2L -> Seq(Some(2 * Hour), None, None)))
  }

  test("cross-batch progression: a later batch completes the funnel") {
    val got = run(Seq(
      Seq(FEvent(1, "A", Hour)),
      Seq(FEvent(1, "B", 2 * Hour)),
      Seq(FEvent(1, "C", 4 * Hour))), Seq("A", "B", "C"))
    assert(got === Map(1L -> Seq(Some(Hour), Some(2 * Hour), Some(4 * Hour))))
  }

  test("equal-timestamp cascade reaches the later stage") {
    val got = run(Seq(Seq(
      FEvent(1, "B", Hour), FEvent(1, "A", Hour))), Seq("A", "B"))
    assert(got === Map(1L -> Seq(Some(Hour), Some(Hour))))
  }

  test("drain over real events matches the batch funnel exactly") {
    val stages = graft.operators.Funnel.EventStages
    val batch = graft.operators.Funnel.counts(
        Tables.load(spark, sfDir, "events")
          .selectExpr("user_id", "event_type", "ts div 1000 AS tus"),
        "user_id", "event_type", "tus", stages)
      .orderBy("stage_idx")
      .as[(Long, String, Long)].collect().toSeq
    val streamed = graft.streaming.StreamingJobs
      .funnelAvailableNow(spark, sfDir)
      .as[(Long, String, Long)].collect().toSeq
    assert(streamed === batch)
    assert(batch.head._3 > 0)
  }
}
