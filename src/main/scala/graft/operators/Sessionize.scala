package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch) — group each key's events into
  * sessions separated by more than `gapUs` of inactivity.
  *
  * Plan: ONE shuffle on the key; the lag window, the cumulative-sum
  * window, and the per-session aggregate all execute on that same
  * partitioning (AliasAware propagation — `.explain` shows a single
  * hashpartitioning exchange). Linear per key at any scale.
  *
  * The streaming twin is [[graft.streaming.StreamingSessionize]]
  * (identical gap semantics, O(active keys) state under a watermark);
  * their equivalence on ordered data is spec-pinned and both sit under
  * the driver's DuckDB oracle gate (e01 / e05).
  */
object Sessionize {

  /** 30-minute inactivity gap, in microseconds. */
  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000

  /** `events(keyCol, timeCol [µs], orderCol)` → one row per session:
    * `(keyCol, session_id, session_start_us, session_end_us,
    * n_events)`. `orderCol` breaks equal-timestamp ties so session
    * numbering is deterministic. */
  def sessions(events: DataFrame, keyCol: String, timeCol: String,
               orderCol: String, gapUs: Long = DefaultGapUs): DataFrame = {
    val k: Column = col(keyCol)
    val t: Column = col(timeCol)
    val w = Window.partitionBy(k).orderBy(t, col(orderCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(t, 1).over(w))
      .withColumn("_new_s",
        when(col("_prev").isNull || t - col("_prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("_new_s")).over(cum))
      .groupBy(k, col("session_id"))
      .agg(min(t).as("session_start_us"), max(t).as("session_end_us"),
        count(lit(1)).as("n_events"))
  }
}
