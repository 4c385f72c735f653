package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingUpsert
import graft.streaming.StreamingUpsert.Change

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600L * 1000000

  test("latestWins folds out-of-order arrivals and flushes on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val live = StreamingUpsert.latestWins(input.toDS(), horizonUs = Hour)
    val query = live.toDF().writeStream.format("memory").queryName("upsert_test")
      .outputMode("append").start()

    // key 1: seq 3 arrives BEFORE seq 1 — the stale upsert must lose
    // key 2: upsert then delete → gone
    // key 3: delete then (later-seq) reinsert, split across batches
    input.addData(
      Change(1L, "v3", 3L, "U", 10L),
      Change(1L, "v1", 1L, "U", 20L),
      Change(2L, "b1", 1L, "U", 30L),
      Change(2L, null, 2L, "D", 40L),
      Change(3L, null, 1L, "D", 50L))
    query.processAllAvailable()
    input.addData(Change(3L, "c2", 2L, "U", 60L))
    query.processAllAvailable()
    // two far-future sentinels push the final watermark past every
    // key's (last arrival + horizon) timeout
    input.addData(Change(-1L, null, 0L, "U", 100L * Hour))
    query.processAllAvailable()
    input.addData(Change(-1L, null, 0L, "U", 200L * Hour))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("upsert_test").filter($"key" =!= -1L)
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "v3", 3L), (3L, "c2", 2L)))
  }
}
