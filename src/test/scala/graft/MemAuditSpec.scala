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

  test("profile reports per-task peak, amplification, and projection for a wide-after-shuffle sort") {
    val fn = (s: org.apache.spark.sql.SparkSession, _: String) => {
      import s.implicits._
      s.range(4000000L)
        // xxhash64 de-correlates the ids so the shuffle's compressed
        // bytes reflect ~8 B/row (sequential longs would LZ4 away)
        .select(xxhash64($"id").as("k"))
        .repartition(4, $"k")
        // widen AFTER the exchange: the sort holds ~200 B/row the
        // shuffle never carried
        .withColumn("pad", sha2(concat($"k".cast("string"), lit("x")), 512))
        .withColumn("pad2", sha2(concat($"k".cast("string"), lit("y")), 512))
        // top-level sort (EliminateSorts would drop one feeding an
        // order-insensitive aggregate)
        .sortWithinPartitions($"pad")
    }
    val stats = MemAudit.profile(spark, fn, sfDir)
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
