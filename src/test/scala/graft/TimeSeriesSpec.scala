package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: (String, Long, Double, Long)*) =
    rows.toDF("k", "t", "v", "id")

  test("timeWeightedAvg weights by segment duration, not row count") {
    // value 10 live for 1s, value 0 live for 9s -> twa = 1.0
    val df = series(("a", 0L, 10.0, 1L), ("a", 1000000L, 0.0, 2L),
      ("a", 10000000L, 99.0, 3L)) // last sample carries no weight
    val out = TimeSeries.timeWeightedAvg(df, Seq("k"), "t", "v", Seq("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 1.0, 10000000L, 2L)))
  }

  test("timeWeightedAvg drops zero-span keys and singletons") {
    val df = series(("solo", 5L, 1.0, 1L),
      ("same", 7L, 1.0, 2L), ("same", 7L, 2.0, 3L),
      ("ok", 0L, 4.0, 4L), ("ok", 10L, 8.0, 5L))
    val out = TimeSeries.timeWeightedAvg(df, Seq("k"), "t", "v", Seq("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("ok", 4.0)))
  }

  test("timeWeightedAvg: simultaneous samples add zero weight in any order") {
    val df = series(("a", 0L, 2.0, 1L), ("a", 0L, 100.0, 2L), ("a", 4L, 2.0, 3L))
    // dt(row1->row2)=0 so the 100.0 contributes nothing; dt(row2->row3)=4
    val out = TimeSeries.timeWeightedAvg(df, Seq("k"), "t", "v", Seq("id"))
      .collect().map(r => (r.getDouble(1), r.getLong(2))).toSeq
    assert(out == Seq((100.0, 4L)))
  }

  test("gapFill forward-fills onto the grid; on-grid sample overrides") {
    val df = series(("a", 5L, 1.0, 1L), ("a", 20L, 2.0, 2L), ("a", 35L, 3.0, 3L))
    val out = TimeSeries.gapFill(df, Seq("k"), "t", "v", stepUs = 10L, Seq("id"))
      .orderBy($"grid_tus")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // grid 10,20,30: 10<-v@5, 20<-on-grid sample, 30<-v@20
    assert(out == Seq((10L, 1.0), (20L, 2.0), (30L, 2.0)))
  }

  test("gapFill: span inside one grid gap emits nothing; ties latest-write-wins") {
    val df = series(("tiny", 11L, 1.0, 1L), ("tiny", 18L, 2.0, 2L),
      ("tie", 10L, 5.0, 3L), ("tie", 10L, 7.0, 4L), ("tie", 25L, 9.0, 5L))
    val out = TimeSeries.gapFill(df, Seq("k"), "t", "v", stepUs = 10L, Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // "tiny" spans (11,18): no multiple of 10 inside -> no rows.
    // "tie": grid 10 and 20; at t=10 two samples, id=4 wins (7.0).
    assert(out == Set(("tie", 10L, 7.0), ("tie", 20L, 7.0)))
  }

  test("gapFill matches brute force on a random multi-key series") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      k <- Seq("u1", "u2", "u3"); i <- 0 until 40
    } yield (k, rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble, i.toLong + rnd.nextInt(3))
    val df = series(rows: _*)
    val step = 37L
    val got = TimeSeries.gapFill(df, Seq("k"), "t", "v", step, Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val expect = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val lo = rs.map(_._2).min; val hi = rs.map(_._2).max
      ((lo + step - 1) / step to hi / step).map { g =>
        val t = g * step
        val fill = rs.filter(_._2 <= t).maxBy(r => (r._2, r._4))
        (k, t, fill._3)
      }
    }.toSet
    assert(got == expect)
  }

  test("timeWeightedAvg matches brute force on a random multi-key series") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      k <- Seq("u1", "u2"); i <- 0 until 50
    } yield (k, rnd.nextInt(500).toLong, rnd.nextInt(100).toDouble, i.toLong)
    val df = series(rows: _*)
    val got = TimeSeries.timeWeightedAvg(df, Seq("k"), "t", "v", Seq("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val expect = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4))
      val segs = sorted.zip(sorted.tail).map { case (a, b) => (a._3, b._2 - a._2) }
      val span = segs.map(_._2).sum
      if (span > 0) Some(k -> segs.map(s => s._1 * s._2).sum / span) else None
    }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, k) }
  }
}
