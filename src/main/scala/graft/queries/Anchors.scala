package graft.queries

import org.apache.spark.sql.SparkSession

/** Conf gate for the exact-anchor twins inside the approx queries
  * (q31 HLL profile, a10 quantile sketch).
  *
  * Those queries exist to demonstrate the SKETCH path — the plan a
  * 100 TB ANALYZE pass would run — but the driver's DuckDB gate can
  * only check a bounded property, which needs exact anchors (exact
  * NDV, exact percentile bounds) computed alongside. The anchors are
  * full-table exact aggregations that dominate the runtime at larger
  * SF, so with them inline the bench measures mostly the anchors, not
  * the approx plan (ADVICE r08).
  *
  * Default ON: the oracle gate and any unconfigured run get the
  * checkable anchored shape. Bench turns it OFF so the recorded timing
  * is the production approx path alone; correctness of that path is
  * still covered because the anchored run executes the identical
  * sketch aggregate and gates it every round.
  */
object Anchors {
  val Key = "spark.graft.approx.anchors"

  /** Whether the exact-anchor twins should run (default true). */
  def enabled(s: SparkSession): Boolean =
    s.conf.getOption(Key).forall(_.toBoolean)
}
