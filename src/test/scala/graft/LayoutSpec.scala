package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits most-significant-column-first") {
    // a=0b11, b=0b01, 2 bits: a0→pos1, b0→pos0, a1→pos3, b1→pos2
    val got = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.zValue(Seq($"a", $"b"), bits = 2).as("z"))
      .as[Long].head()
    assert(got === (8L + 2L + 1L))
    // only the low `bits` bits contribute
    val masked = Seq((3L + 1024L, 1L)).toDF("a", "b")
      .select(Layout.zValue(Seq($"a", $"b"), bits = 2).as("z"))
      .as[Long].head()
    assert(masked === got)
    // three columns, and the key of all-max fits in k*bits bits
    val max3 = Seq((7L, 7L, 7L)).toDF("a", "b", "c")
      .select(Layout.zValue(Seq($"a", $"b", $"c"), bits = 3).as("z"))
      .as[Long].head()
    assert(max3 === (1L << 9) - 1)
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq($"a", $"b"), bits = 32) // 64 bits: sign overflow
    }
  }

  test("zValueSql is the exact SQL twin of the expression") {
    val d = Seq((41L, 1L), (1000L, 77L), (65535L, 65535L)).toDF("a", "b")
    d.createOrReplaceTempView("zt")
    val viaExpr = d.select(Layout.zValue(Seq($"a", $"b")).as("z"))
      .as[Long].collect().toSeq
    val viaSql = spark.sql(
        s"SELECT ${Layout.zValueSql(Seq("a", "b"))} AS z FROM zt")
      .as[Long].collect().toSeq
    assert(viaExpr === viaSql)
  }

  test("zorder clusters partitions into boxes: an hour probe prunes most partitions") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .withColumn("hour", expr("(ts div 1000) div 3600000000"))
      .select($"event_id", $"user_id", $"hour")
    def hourSpans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = df
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid").agg(min($"hour").as("lo"), max($"hour").as("hi"))
      .select($"lo", $"hi").as[(Long, Long)].collect().toSeq
    val probe = ev.agg(expr("percentile_approx(hour, 0.5)")).first().getLong(0)
    // linear layout sorted by user_id: every partition spans ~all hours
    val linear = hourSpans(ev.repartitionByRange(16, $"user_id"))
    val zed = hourSpans(Layout.zorder(ev, Seq("user_id", "hour"),
      bits = 16, numPartitions = 16))
    val linearHit = linear.count { case (lo, hi) => lo <= probe && probe <= hi }
    val zedHit = zed.count { case (lo, hi) => lo <= probe && probe <= hi }
    assert(linearHit >= 12, s"precondition: linear layout should not prune ($linearHit)")
    assert(zedHit * 2 <= linearHit,
      s"z-order pruned too little: $zedHit vs linear $linearHit")
  }
}
