package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Round-7 additions part c: HITS hubs/authorities (g06), robust
  * median/MAD outlier gating (a17), and the zone-map skip audit
  * (x24). Each checked against a sequential in-memory reference —
  * independent of the DuckDB oracle gate.
  */
class NewOpsR7cSpec extends SparkSpec {
  import spark.implicits._

  test("hits matches a sequential reference on a random directed graph") {
    val rnd = new scala.util.Random(4242)
    val edges = (1 to 220)
      .map(_ => (rnd.nextInt(28).toLong, rnd.nextInt(28).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = Graphs.hits(edges.toDF("src", "dst"),
        "src", "dst", (0L until 30L).toDF("id"), "id", iterations = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // sequential: a_i(v) = Σ h_{i-1}(u) over u→v; h_i(u) = Σ a_i(v)
    val endpoints = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var h = endpoints.map(_ -> 1L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 3) {
      a = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => h.getOrElse(e._1, 0L)).sum }
      h = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => a.getOrElse(e._2, 0L)).sum }
    }
    for (id <- 0L until 30L) {
      assert(got(id) == ((a.getOrElse(id, 0L), h.getOrElse(id, 0L))), s"vertex $id")
    }
    // the planted structure must produce nonzero mutual reinforcement
    assert(got.values.exists(_._1 > 0) && got.values.exists(_._2 > 0))
  }

  test("g06 on sf0.001: planted copies give their originals nonzero authority") {
    val rows = SparkEntry.queries("g06_hits")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // planted edge (orig → copy at +Planted.Off) orients a<b, so each COPY is
    // an authority fed by its original (a hub); both must be nonzero
    val copies = byId.keys.filter(_ >= graft.queries.Planted.Off)
    assert(copies.nonEmpty)
    assert(copies.exists(c => byId(c)._1 > 0L), "no copy gained authority")
    assert(copies.map(_ - graft.queries.Planted.Off).exists(o => byId(o)._2 > 0L),
      "no original gained hub mass")
  }

  test("a17 matches a sequential exact median/MAD reference at sf0.001") {
    val got = SparkEntry.queries("a17_mad_outliers")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_views"), r.getAs[Double]("med_value"),
          r.getAs[Double]("mad_value"), r.getAs[Long]("n_outliers"))))
      .toMap

    val views = Tables.load(spark, sfDir, "events")
      .filter($"event_type" === "view")
      .select($"user_id", $"value").as[(Long, Double)].collect()
    def med2(xs: Seq[Long]): Long = { // middle-pair sum = 2·median
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val ref = views.groupBy(_._1).map { case (u, vs) =>
      val vi = vs.map(v => BigDecimal(v._2 * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toSeq
      val m2 = med2(vi)
      val dev = vi.map(x => math.abs(2 * x - m2))
      val m4 = med2(dev)
      val nOut = dev.count(d => 2 * d > 3 * m4).toLong
      u -> ((vi.size.toLong,
        math.rint(m2 / 2e6 * 1e6) / 1e6, math.rint(m4 / 4e6 * 1e6) / 1e6, nOut))
    }
    assert(got.keySet == ref.keySet)
    for ((u, (n, med, mad, out)) <- ref) {
      val (gn, gmed, gmad, gout) = got(u)
      assert(gn == n && gout == out, s"user $u counts")
      assert(math.abs(gmed - med) < 1e-9 && math.abs(gmad - mad) < 1e-9,
        s"user $u med/mad")
    }
  }

  test("x24: zone maps match a sequential build; zorder prunes at least as much") {
    val rows = SparkEntry.queries("x24_skip_stats")(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("natural", "zorder"))
    val nat = rows(0); val zo = rows(1)
    val ev = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"user_id").as[(Long, Long)].collect()
    // sequential natural-layout zone map + the same band-probe audit
    val zones = ev.groupBy(_._1 / 256).map { case (_, es) =>
      (es.length.toLong, es.map(_._2).min, es.map(_._2).max) }
    val prunable = zones.filter(z => z._3 < 10L || z._2 > 19L)
    assert(nat.getAs[Long]("n_zones") == zones.size.toLong)
    assert(nat.getAs[Long]("n_prunable") == prunable.size.toLong)
    assert(nat.getAs[Long]("rows_total") == ev.length.toLong)
    assert(nat.getAs[Long]("rows_skipped") == prunable.map(_._1).sum)
    // both layouts see every row; Z-order never skips fewer
    assert(zo.getAs[Long]("rows_total") == ev.length.toLong)
    assert(zo.getAs[Long]("rows_skipped") >= nat.getAs[Long]("rows_skipped"))
  }

  test("zoneMap is one partial+final aggregate — no joins, one exchange") {
    val e = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"user_id")
      .withColumn("zone", expr("event_id div 256"))
    val p = graft.operators.Layout.zoneMap(e, "zone", Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }
}
