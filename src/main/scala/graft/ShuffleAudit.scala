package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shuffle/spill audit: runs each query once (after a warm pass) and
  * sums the SQL metrics of its EXECUTED plan — shuffle bytes written
  * across every exchange, spill bytes across sorts/aggregates — the
  * quantitative side of PLANS.md's "minimize shuffles" claims.
  * Walking the AQE-final plan (instead of a SparkListener) attributes
  * bytes to the query precisely, counts a ReusedExchange's child only
  * once, and needs no event-bus synchronization.
  *
  * Scope caveat: the audit sees ONE QueryExecution — the returned
  * frame's. Operators that materialize internally report only their
  * post-materialization dataflow: iterative operators (d07/g01/g02)
  * exclude the localCheckpoint'ed edge-mining bytes, and streaming
  * drains (e05/e06/…) exclude the micro-batch execution, reporting
  * just the sink read + final sort. Batch single-plan queries — the
  * vast majority — are reported in full.
  *
  * Usage: tools/jrun.sh graft.ShuffleAudit [sfDir] [query...]
  * Prints one JSON line: {"query":{"shuffle_mb":x,"spill_mb":y},...}.
  */
object ShuffleAudit {

  /** Every node of the executed plan, descending through AQE wrappers
    * and subqueries; a ReusedExchange's subtree is NOT re-entered (its
    * bytes were counted at the original exchange). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case _: ReusedExchangeExec => Seq(p)
      case _ => p +: p.children.flatMap(flatten)
    }
    self ++ p.subqueries.flatMap(flatten)
  }

  private def sumMetric(nodes: Seq[SparkPlan], key: String): Long =
    nodes.flatMap(_.metrics.get(key)).map(_.value).filter(_ > 0).sum

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    // one warm pass: codegen, file listing, memo fits
    ordered.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    def mb(v: Long): Double = math.round(v / 1048.576) / 1000.0
    val rows = ordered.flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // execute THIS QueryExecution (df.count() would plan a separate
        // aggregate execution and leave these metrics untouched)
        df.queryExecution.toRdd.count()
        val nodes = flatten(df.queryExecution.executedPlan)
        val written = sumMetric(nodes, "shuffleBytesWritten")
        val spill = sumMetric(nodes, "spillSize")
        Some(name -> ((mb(written), mb(spill))))
      } catch { case _: Throwable => None }
    }
    val line = rows
      .map { case (n, (w, s)) => s""""$n":{"shuffle_mb":$w,"spill_mb":$s}""" }
      .mkString("{", ",", "}")
    println(line)
    spark.stop()
  }
}
