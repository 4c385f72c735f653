package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation primitives.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) already
  * splits oversized sort-merge partitions at runtime — prefer it.
  * These utilities cover the cases AQE doesn't reach:
  *  - a broadcast-infeasible join whose *build* side is small enough to
  *    replicate `saltBuckets`× but whose probe side has heavy-hitter
  *    keys ([[saltedJoin]]);
  *  - high-cardinality-accumulator aggregations (e.g. collect_set,
  *    count distinct) where one hot group overwhelms a single reducer
  *    ([[twoPhaseDistinctCount]]).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, with the big side's rows
    * scattered across `saltBuckets` sub-keys and the small side
    * replicated to match — one hot key spreads over `saltBuckets`
    * reducers instead of melting one. Result identical to the plain
    * join.
    *
    * Only join types that never emit an UNMATCHED small-side row are
    * allowed: the small side is replicated `saltBuckets`×, so
    * right/full-outer (and right-semi/anti) would emit each unmatched
    * small row once per replica — silently wrong results. For those,
    * flip the sides or use AQE's skew handling. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1)
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti", "cross")(jt),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched replicated small-side rows; " +
        "use inner/left_outer/left_semi/left_anti or flip the sides")
    val bigSalted = big.withColumn("_salt", rowSalt(big, saltBuckets))
    val smallSalted = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigSalted.join(smallSalted, keys :+ "_salt", joinType).drop("_salt")
  }

  /** The deterministic per-row scatter [[saltedJoin]] salts the big
    * side with: hash of the FULL row (varies within a key group, so a
    * hot key spreads), never `rand()` (a task retry would re-roll the
    * salt and break exactly-once placement). Exposed so tests and
    * monitoring can audit the spread a given frame will get. */
  def rowSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltBuckets))
      .cast("int")

  /** count(DISTINCT valueCol) per group, two-phase: first collapse
    * (group, value) pairs — spreading a hot group across reducers by
    * the value hash — then count per group. */
  def twoPhaseDistinctCount(df: DataFrame, groupCols: Seq[String],
                            valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.select((groupCols :+ valueCol).map(col): _*)
      .distinct() // shuffles on (group, value): hot groups spread by value
      .groupBy(g: _*)
      .agg(count(lit(1)).as(s"nd_$valueCol"))
  }
}
