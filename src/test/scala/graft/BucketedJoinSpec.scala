package graft

import org.apache.spark.sql.functions._

import graft.queries.CurationQueries

/** The property p08 exists to prove: bucketed, co-partitioned tables
  * join WITHOUT a shuffle. The write pays the partitioning once; every
  * later join on the bucket key reads it back for free. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("p08: bucketed fact-fact join plans SortMergeJoin with ZERO exchanges") {
    val (o, l) = CurationQueries.bucketedTables(spark, sfDir)
    val joined = o.hint("merge").join(l, $"o_orderkey" === $"l_orderkey")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(600))
    assert(!p.contains("Exchange"),
      s"bucketed join should not shuffle either side:\n${p.take(1500)}")
    // bucket pruning metadata survives the round trip
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"scan is not bucket-aware:\n${p.take(1500)}")
  }

  test("p08: the bucketed join's answer equals the plain-table join's") {
    val (o, l) = CurationQueries.bucketedTables(spark, sfDir)
    def agg(of: org.apache.spark.sql.DataFrame, lf: org.apache.spark.sql.DataFrame) =
      of.join(lf, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = agg(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      spark.read.parquet(s"$sfDir/lineitem.parquet"))
    assert(agg(o, l) == plain)
  }
}
