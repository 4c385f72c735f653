package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.KeyedEvent

class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600L * 1000000

  private def run(batches: Seq[Seq[KeyedEvent]]): Map[Long, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val out = StreamingHeavyHitters.counts(input.toDS(),
      horizonUs = 10 * Hour, watermarkDelay = "1 minute")
    val name = s"hh_test_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(KeyedEvent(-1L, 1000 * Hour)); q.processAllAvailable()
      input.addData(KeyedEvent(-1L, 2000 * Hour)); q.processAllAvailable()
      spark.table(name).as[(Long, Long)].collect()
        .filter(_._1 >= 0).toMap
    } finally q.stop()
  }

  test("counters accumulate across micro-batches and flush exactly once") {
    val got = run(Seq(
      Seq(KeyedEvent(1, Hour), KeyedEvent(1, Hour), KeyedEvent(2, Hour)),
      Seq(KeyedEvent(1, 2 * Hour), KeyedEvent(3, 2 * Hour)),
      Seq(KeyedEvent(2, 3 * Hour))))
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("drain over real events matches the batch GROUP BY exactly") {
    val streamed = graft.streaming.StreamingJobs
      .heavyUsersAvailableNow(spark, sfDir, minCount = 1L)
      .as[(Long, Long)].collect().toMap
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(streamed === batch)
  }
}
