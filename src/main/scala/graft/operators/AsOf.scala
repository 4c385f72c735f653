package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single right
  * row closest in time at-or-before it (`backward`, the default) or
  * at-or-after it (`forward`), per key. The temporal primitive behind
  * "most recent click before each purchase", "latest quote for each
  * trade", "sensor reading in effect at each event".
  *
  * Plan shape: UNION the two sides into one per-key stream sorted by
  * (time, side), then carry the last-seen right row forward with
  * `last(struct, ignoreNulls)` over a running window — ONE shuffle on
  * the keys, linear work per key. The naive composition (equi-join on
  * key + backward filter + row_number) materializes
  * O(|left| × |right|) candidate rows per key first; a power user with
  * 10⁵ clicks × 10³ purchases would build 10⁸ rows. The union shape
  * never forms pairs at all, so it survives hot keys at 100 TB.
  *
  * Right columns ride in ONE struct so every output column comes from
  * the SAME matched row — carrying them individually would let a NULL
  * field fall back to an older right row's value.
  *
  * Semantics (mirrors pandas `merge_asof`): left join — unmatched left
  * rows keep NULL right columns; matches at equal timestamps count in
  * both directions; `toleranceUs` voids matches farther than the
  * bound; `tieBreak` orders same-timestamp right rows (the LAST one
  * in that order wins for `backward`, mirroring "latest"), and is
  * also the determinism guard — without it, equal-timestamp right
  * rows resolve by partition order.
  */
object AsOf {

  /** Shared validation + tagged-union builder for the as-of family. */
  private def taggedUnion(left: DataFrame, right: DataFrame, keys: Seq[String],
                          leftTime: String, rightTime: String,
                          toleranceUs: Option[Long]): (DataFrame, Seq[String], Seq[String]) = {
    val overlap = (left.columns.toSet & right.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"asofJoin: non-key columns appear on both sides: $overlap — rename first")
    val reserved = Set("_side", "_t", "_payload", "_match", "_m", "_mb", "_mf", "_mbv", "_mfv")
    val clash = (left.columns.toSet ++ right.columns.toSet) & reserved
    require(clash.isEmpty,
      s"asofJoin: column names $clash collide with internal working columns — rename first")
    toleranceUs.foreach(t => require(t >= 0, "asofJoin: tolerance must be >= 0"))

    val leftCols = left.columns.toSeq
    val rightPayloadCols = right.columns.toSeq.filterNot(keys.contains)

    // one tagged stream: side 0 = right (sorts before left at equal
    // times, so an equal-timestamp right row is visible to the left
    // row). A NULL-time right row can never be "at or before/after"
    // anything (mirrors merge_asof, which rejects nulls) — drop it
    // here, or NULLS FIRST ordering would carry it as a valid match.
    val taggedRight = right
      .filter(col(rightTime).isNotNull)
      .withColumn("_side", lit(0))
      .withColumn("_t", col(rightTime))
      .withColumn("_payload", struct(rightPayloadCols.map(col): _*))
      .select((keys.map(col) :+ col("_side") :+ col("_t") :+ col("_payload")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left
      .withColumn("_side", lit(1))
      .withColumn("_t", col(leftTime))
      .withColumn("_payload", lit(null).cast(taggedRight.schema("_payload").dataType))
      .select((keys.map(col) :+ col("_side") :+ col("_t") :+ col("_payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    (taggedRight.unionByName(taggedLeft), leftCols, rightPayloadCols)
  }

  /** `left` and `right` must share exactly `keys` as common columns;
    * right non-key columns (including `rightTime`) are appended to the
    * left row. Time columns are epoch-comparable numerics (e.g. µs). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               direction: String = "backward",
               toleranceUs: Option[Long] = None,
               tieBreak: Seq[String] = Nil): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got '$direction'")
    val (tagged, leftCols, rightPayloadCols) =
      taggedUnion(left, right, keys, leftTime, rightTime, toleranceUs)
    val backward = direction == "backward"

    // backward: ascending time, carry the LAST right row seen.
    // forward: descending time, same carry = the EARLIEST right ≥ left.
    val dirSort: Column => Column = if (backward) c => c.asc else c => c.desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((dirSort(col("_t")) +: col("_side").asc +:
        tieBreak.map(t => dirSort(col("_payload").getField(t)))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = tagged
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    // a NULL-time LEFT row has no point in time to match at: in the
    // forward (desc) ordering it would sort last and see a spurious
    // carried match, so void it explicitly (backward is safe only by
    // accident of NULLS FIRST)
    val withinTol = toleranceUs match {
      case None => when(col("_t").isNotNull, col("_match"))
      case Some(t) =>
        val gap = if (backward) col("_t") - col("_match").getField(rightTime)
                  else col("_match").getField(rightTime) - col("_t")
        when(col("_t").isNotNull && col("_match").isNotNull && gap <= t, col("_match"))
    }

    carried
      .withColumn("_m", withinTol)
      .select(leftCols.map(col) ++
        rightPayloadCols.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** `nearest`-direction as-of: for every left row, the right row
    * closest in ABSOLUTE time distance (per key, within the optional
    * tolerance); an exact tie between the best at-or-before and the
    * best at-or-after match resolves BACKWARD (the earlier right row)
    * — deterministic, and the convention pandas documents.
    *
    * Plan shape: the SAME single key-shuffle as [[asofJoin]] — the
    * tagged union gets TWO window passes over one exchange (ascending
    * carry = best backward match, descending carry = best forward
    * match; Spark plans exchange-reuse with two sorts), then a
    * per-row arithmetic pick. Still no candidate pairs, still
    * hot-key-safe: "nearest" costs one extra sort over "backward",
    * not a join.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  toleranceUs: Option[Long] = None,
                  tieBreak: Seq[String] = Nil): DataFrame = {
    val (tagged, leftCols, rightPayloadCols) =
      taggedUnion(left, right, keys, leftTime, rightTime, toleranceUs)

    def win(asc: Boolean) = {
      val d: Column => Column = if (asc) c => c.asc else c => c.desc
      Window.partitionBy(keys.map(col): _*)
        .orderBy((d(col("_t")) +: col("_side").asc +:
          tieBreak.map(t => d(col("_payload").getField(t)))): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val carried = tagged
      .withColumn("_mb", last(col("_payload"), ignoreNulls = true).over(win(asc = true)))
      .withColumn("_mf", last(col("_payload"), ignoreNulls = true).over(win(asc = false)))
      .filter(col("_side") === 1)

    val db = col("_t") - col("_mb").getField(rightTime)
    val df = col("_mf").getField(rightTime) - col("_t")
    val tol = toleranceUs.map(lit(_)).getOrElse(lit(Long.MaxValue))
    val bOk = col("_mb").isNotNull && db <= tol
    val fOk = col("_mf").isNotNull && df <= tol
    val nullPayload = lit(null).cast(tagged.schema("_payload").dataType)
    val chosen = when(col("_t").isNull, nullPayload)
      .when(bOk && (!fOk || db <= df), col("_mb"))
      .when(fOk, col("_mf"))
      .otherwise(nullPayload)

    carried
      .withColumn("_m", chosen)
      .select(leftCols.map(col) ++
        rightPayloadCols.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Bracket as-of: BOTH the best at-or-before and best at-or-after
    * right rows per left row, appended with `_b` / `_f` suffixes —
    * the primitive behind time-series interpolation (lerp between
    * bracketing sensor readings), gap measurement, and staleness
    * audits. Same single key-shuffle + two window carries as
    * [[asofNearest]]; each side independently NULL when absent or
    * out of tolerance. */
  def asofBracket(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  toleranceUs: Option[Long] = None,
                  tieBreak: Seq[String] = Nil): DataFrame = {
    val (tagged, leftCols, rightPayloadCols) =
      taggedUnion(left, right, keys, leftTime, rightTime, toleranceUs)

    def win(asc: Boolean) = {
      val d: Column => Column = if (asc) c => c.asc else c => c.desc
      Window.partitionBy(keys.map(col): _*)
        .orderBy((d(col("_t")) +: col("_side").asc +:
          tieBreak.map(t => d(col("_payload").getField(t)))): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val carried = tagged
      .withColumn("_mb", last(col("_payload"), ignoreNulls = true).over(win(asc = true)))
      .withColumn("_mf", last(col("_payload"), ignoreNulls = true).over(win(asc = false)))
      .filter(col("_side") === 1)

    val db = col("_t") - col("_mb").getField(rightTime)
    val df = col("_mf").getField(rightTime) - col("_t")
    val tol = toleranceUs.map(lit(_)).getOrElse(lit(Long.MaxValue))
    val nullPayload = lit(null).cast(tagged.schema("_payload").dataType)
    val mb = when(col("_t").isNotNull && col("_mb").isNotNull && db <= tol, col("_mb"))
      .otherwise(nullPayload)
    val mf = when(col("_t").isNotNull && col("_mf").isNotNull && df <= tol, col("_mf"))
      .otherwise(nullPayload)

    carried
      .withColumn("_mbv", mb).withColumn("_mfv", mf)
      .select(leftCols.map(col) ++
        rightPayloadCols.map(c => col("_mbv").getField(c).as(s"${c}_b")) ++
        rightPayloadCols.map(c => col("_mfv").getField(c).as(s"${c}_f")): _*)
  }
}
