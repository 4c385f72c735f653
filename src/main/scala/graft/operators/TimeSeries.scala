package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Irregular-time-series primitives: time-weighted aggregation and
  * regular-grid resampling (gap fill). Both are staples of sensor /
  * metrics / market-data pipelines that the relational operators
  * don't cover directly: the weight of a sample is the TIME it was
  * live, not its row count, and downstream models want values on a
  * regular grid even though events arrive whenever they arrive.
  *
  * Scale shape (both operators): ONE hash exchange on the series key.
  * [[timeWeightedAvg]] computes segment durations with a single
  * window pass and feeds the per-key aggregate WITHOUT re-shuffling —
  * the window's hash partitioning already satisfies the aggregate's
  * requirement, so Catalyst plans partial+final agg over the same
  * exchange. [[gapFill]] unions the samples with a generated grid and
  * carries the latest sample forward in one window pass — never a
  * per-grid-point probe join, never a driver-side loop over keys.
  */
object TimeSeries {

  /** Per-key time-weighted average: each sample's value is weighted
    * by the duration until the NEXT sample (the standard left-
    * continuous step interpretation; the last sample of a key carries
    * no weight). Keys whose samples all share one timestamp have zero
    * total span and are dropped — there is no interval to average
    * over. Emits `keys :+ (twa, span_us, n_segments)`.
    *
    * `tieBreak` makes simultaneous samples deterministic: segments
    * between same-time rows get dt = 0 and contribute nothing, so any
    * total order works — the tiebreak just pins lead()'s row order.
    */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], timeCol: String,
                      valueCol: String, tieBreak: Seq[String] = Nil,
                      outCol: String = "twa"): DataFrame = {
    val ord = (col(timeCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.select(((keys :+ timeCol :+ valueCol) ++ tieBreak).distinct.map(col): _*)
      .withColumn("_dt", lead(col(timeCol), 1).over(w) - col(timeCol))
      .filter(col("_dt").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(valueCol) * col("_dt")).as("_wsum"),
        sum(col("_dt")).as("span_us"),
        count(lit(1)).as("n_segments"))
      .filter(col("span_us") > 0)
      .select(keys.map(col) ++ Seq(
        (col("_wsum") / col("span_us")).as(outCol),
        col("span_us"), col("n_segments")): _*)
  }

  /** Resample each key's series onto the regular grid `t = k·stepUs`
    * (grid points within `[min(t), max(t)]` of that key), forward-
    * filling the most recent sample value at or before each grid
    * point. A sample landing exactly on a grid point wins over the
    * carry; simultaneous samples resolve to the `tieBreak`-largest
    * row (the "latest write wins" convention). Emits
    * `keys :+ (grid_tus, valueCol)`.
    *
    * Plan: per-key bounds aggregate → `sequence()` explode generates
    * the grid map-side (never on the driver) → union with the samples
    * → one ascending window carry → keep grid rows. Grid volume is
    * span/step per key — explicit, budgetable row growth, the same
    * order as the model's own input; nothing is quadratic in samples.
    */
  def gapFill(df: DataFrame, keys: Seq[String], timeCol: String,
              valueCol: String, stepUs: Long,
              tieBreak: Seq[String] = Nil): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive: $stepUs")
    val k = keys.map(col)
    val samples =
      df.select(((keys :+ timeCol :+ valueCol) ++ tieBreak).distinct.map(col): _*)

    // Interval-ownership shape: ONE window pass over the SAMPLES
    // assigns each (tieBreak-last-at-its-time) sample the carry value
    // and the half-open validity interval [t, next-time); the grid
    // points inside each interval are then emitted MAP-SIDE after the
    // window (integer grid-index arithmetic — times are epoch micros
    // ≥ 0, and float ceil/floor on ~2^50 timestamps could round an
    // on-grid bound off the grid). The retired shape exploded the
    // grid FIRST and carried it through the window's exchange+sort:
    // span/step × keys rows of shuffle (the r9 sf10 audit measured
    // 4.3 GB of window-sort spill from exactly that); here the
    // exchange carries sample-sized data only and the grid never
    // shuffles at all.
    val ord: Seq[Column] = (col(timeCol) +: tieBreak.map(col)).map(_.asc)
    val wRun = Window.partitionBy(k: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(k: _*).orderBy(ord: _*)
    val wAll = Window.partitionBy(k: _*)

    samples
      // carry through null-valued samples, as the retired shape's
      // last(ignoreNulls) did
      .withColumn("_fill", last(col(valueCol), ignoreNulls = true).over(wRun))
      .withColumn("_nt", lead(col(timeCol), 1).over(wLead))
      .withColumn("_hi", max(col(timeCol)).over(wAll))
      // interval owner = the tieBreak-last row at its timestamp ("latest
      // write wins"); rows with a same-time successor own nothing
      .filter(col("_nt").isNull || col("_nt") > col(timeCol))
      .withColumn("_k0", expr(s"($timeCol + ${stepUs - 1}) div $stepUs"))
      // grid points strictly before the next sample (an on-grid next
      // sample owns its own point); the last owner runs to floor(hi)
      .withColumn("_k1", when(col("_nt").isNull, expr(s"_hi div $stepUs"))
        .otherwise(expr(s"(_nt - 1) div $stepUs")))
      // an interval spanning no grid point emits nothing — and
      // sequence(start > stop) would count DOWN, not emit empty
      .filter(col("_k0") <= col("_k1"))
      .select(k :+ explode(sequence(col("_k0"), col("_k1"))).as("_k") :+ col("_fill"): _*)
      .select(k ++ Seq((col("_k") * stepUs).as("grid_tus"), col("_fill").as(valueCol)): _*)
  }
}
