package graft

/** Output-cardinality diagnostic: `count()` of a query's result frame
  * per data dir. Exists to attribute super-linear shuffle growth to
  * ANSWER growth where that is the mechanism — a pair-mining query
  * whose duplicate clusters double per rung emits ~4× the pairs, and
  * no algorithm shuffles less than its output (the sf40 d04 analysis;
  * see PLANS.md round-11 sf40 section). Count only — the frame is
  * never collected.
  *
  * Usage: tools/jrun.sh graft.QueryCountDiag <query> <dir> [dir2 ...]
  */
object QueryCountDiag {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryCountDiag <query> <dir> [dir2 ...]")
    val name = args(0)
    require(SparkEntry.queries.contains(name), s"unknown query $name")
    val spark = GraftSession.get("query-count-diag")
    for (dir <- args.drop(1)) {
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(s"[qcount] $name $dir rows=$n")
    }
    spark.stop()
  }
}
