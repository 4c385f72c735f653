package graft

import org.apache.spark.sql.Row

/** q31: the approx table profile — the 100 TB twin of q30's exact
  * profile. The driver gate for it is rows-only (HLL values are
  * engine-specific), so the REAL properties are pinned here: the plan
  * must not multiply scan rows (no Expand — that is the entire reason
  * the query exists), the exact stats must be identical to q30's, and
  * the HLL NDV must sit within the documented relative error of the
  * exact NDV. */
class ProfileApproxSpec extends SparkSpec {

  private def rowsOf(name: String, dir: String): Map[String, Row] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap

  test("plan has no Expand and no row multiplication") {
    val p = SparkEntry.queries("q31_profile_approx")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"Expand in approx profile plan:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial+final agg pair")
    // q30's exact multi-distinct DOES carry the Expand — the contrast
    // that makes q31 the scale path
    val exact = SparkEntry.queries("q30_table_profile")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(exact.contains("Expand"), "q30 lost its exact multi-distinct shape?")
  }

  test("a10 approx percentiles sit within rank tolerance of a04's exact ones") {
    // The sketch's guarantee is on RANK, not value: a value-relative
    // tolerance is meaningless at a heavy tail where one rank step
    // jumps 25% in value. Gate each approx quantile q between the
    // exact (q-eps) and (q+eps) percentiles instead.
    import org.apache.spark.sql.functions._
    val eps = 0.01
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val approx = rowsOf("a10_percentiles_approx", dir)
      val qs = Seq(0.5, 0.9, 0.99)
      val aggs = qs.flatMap(q => Seq(
        expr(s"percentile(value, ${math.max(0.0, q - eps)})").as(f"lo_$q"),
        expr(s"percentile(value, ${math.min(1.0, q + eps)})").as(f"hi_$q")))
      val bounds = graft.Tables.load(spark, dir, "events")
        .groupBy(col("event_type"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getString(0) -> r).toMap
      assert(approx.keySet == bounds.keySet)
      for ((etype, a) <- approx; (q, i) <- qs.zipWithIndex) {
        val va = a.getDouble(i + 1)
        val (lo, hi) = (bounds(etype).getDouble(1 + 2 * i),
          bounds(etype).getDouble(2 + 2 * i))
        assert(va >= lo - 1e-9 && va <= hi + 1e-9,
          s"$etype q=$q approx=$va outside exact rank band [$lo, $hi] at $dir")
      }
    }
  }

  test("a10 plans a plain partial+final aggregate (no per-group sort blowup)") {
    val p = SparkEntry.queries("a10_percentiles_approx")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r.findAllIn(p).nonEmpty)
    assert(!p.contains("Expand"), "unexpected Expand in approx percentile plan")
  }

  test("exact stats match q30; NDV within HLL tolerance at two SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = rowsOf("q30_table_profile", dir)
      val approx = rowsOf("q31_profile_approx", dir)
      assert(approx.keySet == exact.keySet)
      for ((cname, a) <- approx) {
        val e = exact(cname)
        assert(a.get(1) == e.get(1), s"$cname min_v drifted at $dir")
        assert(a.get(2) == e.get(2), s"$cname max_v drifted at $dir")
        assert(a.getLong(4) == e.getLong(4), s"$cname n_nulls drifted at $dir")
        val (ndvA, ndvE) = (a.getLong(3).toDouble, e.getLong(3).toDouble)
        // default rsd is 0.05; allow 3 sigma
        assert(math.abs(ndvA - ndvE) <= math.max(1.0, 0.15 * ndvE),
          s"$cname ndv approx=$ndvA exact=$ndvE at $dir")
      }
    }
  }
}
