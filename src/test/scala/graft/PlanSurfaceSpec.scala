package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Whole-surface plan gate (VERDICT r09 #2): r8 asserted
  * zero-CartesianProduct / zero-BroadcastNestedLoopJoin /
  * zero-ScalaUDF over a hand-generated EXPLAIN dump, which went stale
  * the moment plans changed. This spec re-derives the assertion from
  * the live surface EVERY round: it executes every `SparkEntry` query
  * at sf0.001 (execution first, so the FINAL adaptive plan — AQE join
  * rewrites, reused exchanges — is what gets inspected) and walks the
  * plan tree STRUCTURALLY, so the benign cases are verified
  * properties, not a name allowlist:
  *
  *  - `CartesianProduct` — always toxic (data × data with no key).
  *  - `BroadcastNestedLoopJoin` — benign ONLY when the broadcast side
  *    is (a) a grouping-less aggregate (one row by construction: the
  *    corpus-totals crossJoin pattern of t11/t17/t19/t23/g07/q22), or
  *    (b) a frame whose REALIZED row count is ≤ [[ProbeSetMax]] (the
  *    documented probe-set scans: s01 brute-force oracle baseline,
  *    s09's ADC query-side distance tables, x18's version list).
  *    Anything else — notably a filtered CORPUS side that stats
  *    misjudged as broadcastable — fails the gate.
  *  - `ScalaUDF` — benign only for the named scalar map-side cases in
  *    `scalaUdfAllowed`, each with its justification inline (this
  *    structural walk caught s05's MLlib-internal UDFs that the old
  *    text grep never saw).
  */
class PlanSurfaceSpec extends SparkSpec {

  /** Probe sets are query-sized by contract; 64 bounds every
    * documented case (8 ANN queries, 4 PIT versions) with headroom
    * while staying far below any corpus-sized frame. */
  private val ProbeSetMax = 64L

  private val scalaUdfAllowed: Map[String, String] = Map(
    "t14_heavy_hitters" ->
      ("CMS probe: the sketch filter closes over a broadcast array; " +
        "scalar map-side, documented in Sketches"),
    "s05_knn_ivf" ->
      ("MLlib surface: KMeansModel.transform / array_to_vector are " +
        "implemented as ScalaUDFs inside Spark ML itself; scalar " +
        "map-side assignment, no exchange touches them"))

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case r: ReusedExchangeExec => p +: flatten(r.child)
      case _ => p +: p.children.flatMap(flatten)
    }
    self ++ p.subqueries.flatMap(flatten)
  }

  private def benignBnlj(j: BroadcastNestedLoopJoinExec): Boolean = {
    val build = j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }
    val nodes = flatten(build)
    val oneRowAgg = nodes.exists {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _ => false
    }
    val realizedRows = nodes.collectFirst { case q: QueryStageExec =>
      q.getRuntimeStatistics.rowCount
    }.flatten
    oneRowAgg || realizedRows.exists(_ <= ProbeSetMax)
  }

  test("all queries: final adaptive plans carry no scale-toxic nodes") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.count()
        val nodes = flatten(df.queryExecution.executedPlan)
        val cartesian = nodes.collect { case c: CartesianProductExec => c }
          .map(_ => s"$name: CartesianProduct")
        val badBnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
          .filterNot(benignBnlj)
          .map(j => s"$name: BroadcastNestedLoopJoin with a non-scalar, " +
            s"non-probe-set broadcast side (${j.joinType})")
        val udfs =
          if (scalaUdfAllowed.contains(name)) Nil
          else nodes.flatMap(_.expressions)
            .flatMap(_.collect { case u: ScalaUDF => u })
            .map(u => s"$name: ScalaUDF ${u.udfName.getOrElse("<anon>")}")
        cartesian ++ badBnlj ++ udfs.distinct
      } catch {
        case e: Throwable =>
          Seq(s"$name: THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      "scale-toxic plan nodes (a new benign case needs a verified " +
        s"structural rule here, not an allowlist entry):\n${failures.mkString("\n")}")
  }
}
