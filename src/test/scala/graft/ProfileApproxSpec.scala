package graft

import org.apache.spark.sql.Row

/** q31 + a10: the approx twins of q30/a04, now driver-gated through
  * bounded-property oracles (round 8): each query emits exact anchors
  * that DuckDB recomputes (counts, min/max, exact NDV, exact rank-band
  * percentiles) plus ok flags asserting the approx value sits inside
  * its documented error envelope — so the flags must be literally TRUE
  * and the anchors must hash-match. This spec pins the plan shapes
  * (the entire reason the approx twins exist) and cross-checks the
  * anchors against the exact queries at two SFs. */
class ProfileApproxSpec extends SparkSpec {

  private def rowsOf(name: String, dir: String): Map[String, Row] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap

  test("q31 plan has no Expand and no row multiplication") {
    val p = SparkEntry.queries("q31_profile_approx")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // neither the HLL profile agg nor the single-distinct gate twins
    // may multiply scan rows — single-distinct plans two-level, not
    // through Expand
    assert(!p.contains("Expand"), s"Expand in approx profile plan:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial+final agg pair")
    // q30's exact profile no longer plans through Expand either (r15:
    // stack-first two-level aggregate — Generate fan-out, one buffer
    // update per row, 3-column exchange instead of the 17-column
    // multi-distinct buffers). Pin THAT shape: a Generate and two
    // aggregation levels (4 HashAggregates: partial+final × 2), no
    // Expand anywhere.
    val exact = SparkEntry.queries("q30_table_profile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!exact.contains("Expand"),
      s"q30 regressed to the Expand multi-distinct shape:\n${exact.take(800)}")
    assert(exact.contains("Generate"), "q30 lost its stack Generate")
    assert("HashAggregate".r.findAllIn(exact).length >= 4,
      "q30 lost its two-level aggregate shape")
  }

  test("a10 ok flags hold and its exact bounds bracket a04's exact quantiles") {
    // The sketch's guarantee is on RANK, not value: each approx
    // quantile q must sit between the exact (q-band) and (q+band)
    // percentiles. The query now computes that check itself (ok_p*);
    // here we assert the flags hold at two SFs and that the emitted
    // band edges really bracket a04's exact point quantiles.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val approx = rowsOf("a10_percentiles_approx", dir)
      val exact = rowsOf("a04_percentiles", dir)
      assert(approx.keySet == exact.keySet)
      for ((etype, a) <- approx; (tag, i) <- Seq("50", "90", "99").zipWithIndex) {
        val (lo, hi, ok) =
          (a.getDouble(2 + 3 * i), a.getDouble(3 + 3 * i), a.getBoolean(4 + 3 * i))
        assert(ok, s"$etype ok_p$tag false at $dir")
        assert(lo <= hi + 1e-9, s"$etype p$tag band inverted at $dir")
        val pt = exact(etype).getDouble(1 + i)
        assert(pt >= lo - 1e-9 && pt <= hi + 1e-9,
          s"$etype exact p$tag=$pt outside emitted band [$lo, $hi] at $dir")
      }
    }
  }

  test("a10 plans plain partial+final aggregates (no per-group sort blowup)") {
    val p = SparkEntry.queries("a10_percentiles_approx")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r.findAllIn(p).nonEmpty)
    assert(!p.contains("Expand"), "unexpected Expand in approx percentile plan")
    // the bounds agg joins back broadcast — group-count-sized frames
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "bounds join should be broadcast")
  }

  test("q31 exact anchors match q30; ndv_ok holds at two SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = rowsOf("q30_table_profile", dir)
      val approx = rowsOf("q31_profile_approx", dir)
      assert(approx.keySet == exact.keySet)
      for ((cname, a) <- approx) {
        val e = exact(cname)
        assert(a.get(1) == e.get(1), s"$cname min_v drifted at $dir")
        assert(a.get(2) == e.get(2), s"$cname max_v drifted at $dir")
        assert(a.getLong(3) == e.getLong(3), s"$cname exact ndv drifted at $dir")
        assert(a.getLong(4) == e.getLong(4), s"$cname n_nulls drifted at $dir")
        assert(a.getBoolean(5), s"$cname ndv_ok false at $dir")
      }
    }
  }
}
