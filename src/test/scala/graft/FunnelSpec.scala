package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("sequential-minima semantics on a hand-built fixture") {
    // u1: full ordered funnel; u2: B happens BEFORE A (must not count
    // toward B); u3: A only; u4: never enters
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "B", 5L), (2L, "A", 10L), (2L, "B", 8L),  // both Bs pre-A
      (3L, "A", 50L),
      (4L, "C", 1L)
    ).toDF("u", "t", "ts")
    val st = Funnel.stageTimes(ev, "u", "t", "ts", Seq("A", "B", "C"))
      .orderBy("u")
      .select($"u", $"t_A", $"t_B", $"t_C")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(st === Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), None, None),
      (3L, Some(50L), None, None)))

    val counts = Funnel.counts(ev, "u", "t", "ts", Seq("A", "B", "C"))
      .orderBy("stage_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(counts === Seq((1L, "A", 3L), (2L, "B", 1L), (3L, "C", 1L)))
  }

  test("equal timestamps count: a same-microsecond later stage is reached") {
    val ev = Seq((1L, "A", 10L), (1L, "B", 10L)).toDF("u", "t", "ts")
    val counts = Funnel.counts(ev, "u", "t", "ts", Seq("A", "B"))
      .orderBy("stage_idx").as[(Long, String, Long)].collect().toSeq
    assert(counts === Seq((1L, "A", 1L), (2L, "B", 1L)))
  }

  test("funnel on real events matches a driver-side brute force") {
    val stages = Seq("signup", "view", "click", "purchase")
    val ev = Tables.load(spark, sfDir, "events")
      .select($"user_id", $"event_type", expr("ts div 1000").as("tus"))
    val got = Funnel.counts(ev, "user_id", "event_type", "tus", stages)
      .orderBy("stage_idx").as[(Long, String, Long)].collect().toSeq

    val rows = ev.as[(Long, String, Long)].collect()
    val byUser = rows.groupBy(_._1)
    val reach = byUser.values.map { evs =>
      var prev = Option.empty[Long]
      stages.map { st =>
        prev = prev match {
          case None if st == stages.head =>
            evs.filter(_._2 == st).map(_._3).minOption
          case Some(p) =>
            evs.filter(e => e._2 == st && e._3 >= p).map(_._3).minOption
          case None => None
        }
        prev.isDefined
      }
    }.toSeq
    val expected = stages.zipWithIndex.map { case (st, i) =>
      (i + 1L, st, reach.count(_(i)).toLong)
    }
    assert(got === expected)
    assert(got.head._3 > 0, "degenerate: nobody enters the funnel")
  }

  test("retention cohorts: first-day cohort, offsets count distinct active days") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 0L), (1L, day + 5L), (1L, day + 9L),   // day 0 cohort, back day 1
      (2L, day * 3), (2L, day * 5),               // day 3 cohort, back day 5
      (3L, day * 3)
    ).toDF("u", "ts")
    val got = Funnel.retention(ev, "u", "ts")
      .orderBy("cohort_day", "day_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 1L), (0L, 1L, 1L),
      (3L, 0L, 2L), (3L, 2L, 1L)))
  }
}
