package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingRangeJoin

class StreamingRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60L * 1000000
  private val Base = 1440 * Min

  case class P(user_id: Long, purchase_id: Long, ptus: Long)
  case class V(user_id: Long, view_id: Long, vtus: Long)

  test("cross-batch stream-stream matches within the band, in both arrival orders") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[P]
    val vIn = MemoryStream[V]
    val joined = StreamingRangeJoin.rangeJoin(
      pIn.toDF(), vIn.toDF(), Seq("user_id"),
      leftTime = "ptus", rightTime = "vtus",
      lowerUs = -60 * Min, upperUs = 0L)
    val q = joined.select($"purchase_id", $"view_id").writeStream
      .format("memory").queryName("ssrj_test")
      .outputMode("append").start()
    try {
      // batch 1: views only — buffered, nothing emits
      vIn.addData(
        V(1L, 101L, Base - 30 * Min), // in band of purchase 11
        V(1L, 102L, Base - 90 * Min), // before the band
        V(2L, 201L, Base - 5 * Min))  // in band of purchase 21 (buffered)
      q.processAllAvailable()
      assert(spark.table("ssrj_test").isEmpty)

      // batch 2: the purchase arrives AFTER its views (right-buffered
      // match) and a view arrives AFTER its purchase (left-buffered)
      pIn.addData(P(1L, 11L, Base), P(2L, 21L, Base + 10 * Min))
      q.processAllAvailable()
      vIn.addData(
        V(1L, 103L, Base - 1 * Min),   // matches buffered purchase 11
        V(2L, 202L, Base + 20 * Min))  // after purchase 21 — no match
      q.processAllAvailable()

      val got = spark.table("ssrj_test")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((11L, 101L), (11L, 103L), (21L, 201L)),
        s"wrong pair set: $got")
    } finally q.stop()
  }

  test("guards: empty band and overlapping columns rejected") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[P]
    val vIn = MemoryStream[V]
    intercept[IllegalArgumentException](StreamingRangeJoin.rangeJoin(
      pIn.toDF(), vIn.toDF(), Seq("user_id"), "ptus", "vtus", 0L, -1L))
    intercept[IllegalArgumentException](StreamingRangeJoin.rangeJoin(
      pIn.toDF(), pIn.toDF(), Seq("user_id"), "ptus", "ptus", -1L, 0L))
  }
}
