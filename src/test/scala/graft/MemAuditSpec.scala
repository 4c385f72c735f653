package graft

import org.apache.spark.sql.functions._

/** The preventive state-size detector must actually SEE the defect
  * class it exists for (VERDICT r10 "what's missing" #1): a stage
  * whose compressed shuffle input is slim but whose per-task in-memory
  * sort state is an order of magnitude wider — the shape that spilled
  * d03/s03/a14/d12/g03/g04 one rung after the rung that measured
  * clean. The synthetic below shuffles bare 8-byte keys and widens
  * them to ~200-byte rows AFTER the exchange, so AQE's byte-based view
  * of the stage is ~25x smaller than the sort state it feeds.
  */
class MemAuditSpec extends SparkSpec {
  import spark.implicits._

  /** The wide-after-shuffle synthetic: bare 8-byte keys widened to
    * ~200-byte rows AFTER the exchange, so AQE's byte view is ~25x
    * smaller than the sort state it feeds. `byNum` picks the exchange
    * origin: an explicit-N repartition (REPARTITION_BY_NUM — the
    * cost-model pin shape) vs a by-column one AQE may size. */
  private def wideSort(byNum: Boolean) =
    (s: org.apache.spark.sql.SparkSession, _: String) => {
      import s.implicits._
      s.range(4000000L)
        // xxhash64 de-correlates the ids so the shuffle's compressed
        // bytes reflect ~8 B/row (sequential longs would LZ4 away)
        .select(xxhash64($"id").as("k"))
        .transform(d => if (byNum) d.repartition(4, $"k") else d.repartition($"k"))
        .withColumn("pad", sha2(concat($"k".cast("string"), lit("x")), 512))
        .withColumn("pad2", sha2(concat($"k".cast("string"), lit("y")), 512))
        // top-level sort (EliminateSorts would drop one feeding an
        // order-insensitive aggregate)
        .sortWithinPartitions($"pad")
    }

  test("profile reports per-task peak, amplification, and projection for a wide-after-shuffle sort") {
    // pin AQE's coalescer off for the by-column run so the task count
    // (and with it the >= 4 MB/task floor) is deterministic
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val stats =
      try MemAudit.profile(spark, wideSort(byNum = false), sfDir)
      finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert(stats.nonEmpty, "no memory-holding nodes profiled")
    val sorts = stats.filter(_.node.toLowerCase.contains("sort"))
    assert(sorts.nonEmpty, s"no Sort node in profile: ${stats.map(_.node)}")
    val s0 = sorts.maxBy(_.maxTaskPeakMb)
    assert(s0.maxTaskPeakMb > 50,
      s"expected >50 MB per-task sort state, got ${s0.maxTaskPeakMb}")
    assert(s0.inputMbPerTask.exists(_ >= 4.0),
      s"expected shuffle-fed input >= the 4 MB ampl floor, got ${s0.inputMbPerTask}")
    assert(s0.ampl.exists(_ > 5.0),
      s"expected amplification > 5x (slim shuffle, wide state), got ${s0.ampl}")
    // the gate value: ampl x 64 MB advisory — the state this stage
    // would hold once AQE coalesces it to the byte target
    assert(s0.projectedMb.exists(_ > 320.0),
      s"expected projected state > 320 MB at the advisory target, got ${s0.projectedMb}")
  }

  test("a REPARTITION_BY_NUM-fed node reports amplification but no projection") {
    // same defect shape, but behind a cost-model-style explicit-N pin:
    // AQE's coalescer skips REPARTITION_BY_NUM, so the 64 MB-advisory
    // counterfactual cannot occur and the projection must be ABSENT
    // (r14: the gate false-fired on d03's pinned pair aggregation —
    // 6.5 MB in / 128 MB peak projecting 1261 MB no schedule produces)
    val stats = MemAudit.profile(spark, wideSort(byNum = true), sfDir)
    val sorts = stats.filter(_.node.toLowerCase.contains("sort"))
    assert(sorts.nonEmpty, s"no Sort node in profile: ${stats.map(_.node)}")
    val s0 = sorts.maxBy(_.maxTaskPeakMb)
    assert(s0.ampl.exists(_ > 5.0),
      s"amplification must still be REPORTED for pinned nodes, got ${s0.ampl}")
    assert(s0.projectedMb.isEmpty,
      s"pinned-fed node must carry no AQE projection, got ${s0.projectedMb}")
  }

  test("a slim aggregate stays under budget and reports no fake amplification") {
    val fn = (s: org.apache.spark.sql.SparkSession, _: String) => {
      import s.implicits._
      s.range(100000L).select(($"id" % 7).as("g"))
        .groupBy($"g").agg(count(lit(1)).as("n"))
    }
    val stats = MemAudit.profile(spark, fn, sfDir)
    // tiny inputs sit below the 4 MB floor: amplification must be
    // ABSENT, not a page-granularity artifact (0.1 MB in / 16 MB page
    // would read as a fake 150x)
    assert(stats.forall(_.ampl.isEmpty),
      s"amplification computed below the input floor: $stats")
    // a 7-group aggregate still reserves one allocator page (64 MB in
    // this heap) — the bound tolerates the page, not real state
    assert(stats.forall(_.maxTaskPeakMb < 128),
      s"slim aggregate exceeded a single-page per-task state: $stats")
  }
}
