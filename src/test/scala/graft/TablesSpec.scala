package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Tables.normalizeTs: the events.ts storage-unit shim. The engine's
  * contract is "ts = long nanos since epoch" (the original fixtures
  * were parquet timestamp[ns], surfaced as a raw long by nanosAsLong);
  * newer fixture generations store timestamp[us]. Both generations —
  * and both timestamp flavors Spark can read them as (LTZ and NTZ) —
  * must normalize to identical long-nanos values, and a ts that is
  * already a long must pass through untouched. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val micros = Seq(0L, 1L, 1000000L, 1700000000000000L)

  test("long ts passes through untouched; no ts column is a no-op") {
    val longTs = micros.map(_ * 1000).toDF("ts")
    assert(Tables.normalizeTs(longTs).as[Long].collect().toSeq ==
      micros.map(_ * 1000))
    val noTs = Seq(1L, 2L).toDF("x")
    assert(Tables.normalizeTs(noTs).columns.toSeq == Seq("x"))
  }

  test("timestamp (LTZ) and timestamp_ntz ts both normalize to long nanos, in place") {
    for (flavor <- Seq("timestamp", "timestamp_ntz")) {
      val df = micros.toDF("us")
        .select(lit("a").as("before"),
          timestamp_micros($"us").cast(flavor).as("ts"),
          lit("z").as("after"))
      val out = Tables.normalizeTs(df)
      // replaced in place: column order and siblings untouched
      assert(out.columns.toSeq == Seq("before", "ts", "after"), flavor)
      assert(out.select($"ts").as[Long].collect().toSeq ==
        micros.map(_ * 1000), flavor)
    }
  }

  test("round-trips through parquet the way the fixtures arrive") {
    val dir = Files.createTempDirectory("graft-tables").toString
    micros.toDF("us")
      .select($"us".as("event_id"), timestamp_micros($"us").as("ts"))
      .coalesce(1).write.parquet(s"$dir/ev")
    val part = new java.io.File(s"$dir/ev").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val loaded = Tables.load(spark, dir, "events")
    assert(loaded.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(loaded.select($"ts").as[Long].collect().sorted.toSeq ==
      micros.map(_ * 1000))
  }
}
