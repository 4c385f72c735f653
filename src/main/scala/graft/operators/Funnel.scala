package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams: funnels ("how many
  * users did A, then B, then C?") and cohort retention ("of the users
  * who arrived on day D, how many were back on day D+k?").
  *
  * Funnel semantics — sequential minima: a user reaches stage k at
  * `t_k = min{ time of a stage-k event ≥ t_{k−1} }`; reaching times
  * are NULL from the first unreached stage on. This is the standard
  * "ordered funnel" definition: later stages only count if they
  * happen AFTER the user's earliest qualifying prior stage.
  *
  * Scale shape: stage 1 is one hash aggregation on the user key; each
  * later stage is an equi-join of that (users-sized, far smaller than
  * events) frame against the pre-filtered stage events plus another
  * user-keyed aggregation — every shuffle is on the same user key, so
  * AQE reuses co-partitioning, and nothing is ever quadratic: the
  * time-ordering constraint rides the join as a residual filter on
  * rows of ONE user. K stages = K passes over a column-pruned,
  * type-filtered slice of the events scan.
  */
object Funnel {

  /** The canonical funnel over the events table — batch query (e08),
    * streaming drain (e10), and their shared oracle all reference
    * this one list, so the twins cannot drift. */
  val EventStages: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Per-user stage reaching times: `(userCol, t_<stage1>, …,
    * t_<stageK>)`, NULL once a stage is not reached. `timeCol` is an
    * integral epoch time (the engine's µs convention). Only users who
    * reached stage 1 appear. */
  def stageTimes(events: DataFrame, userCol: String, typeCol: String,
                 timeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, s"duplicate funnel stages: $stages")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(timeCol)).as(s"t_${stages.head}"))
    stages.sliding(2).foldLeft(first) {
      case (reached, Seq(prev, stage)) =>
        val nxt = events.filter(col(typeCol) === stage)
          .select(col(userCol), col(timeCol))
          .join(reached.select(col(userCol), col(s"t_$prev")), Seq(userCol))
          .filter(col(timeCol) >= col(s"t_$prev"))
          .groupBy(col(userCol))
          .agg(min(col(timeCol)).as(s"t_$stage"))
        reached.join(nxt, Seq(userCol), "left")
      case (reached, _) => reached // single-stage window from sliding
    }
  }

  /** Funnel counts: `(stage_idx, stage, n_users)` in stage order —
    * n_users = users whose reaching time for that stage is non-NULL. */
  def counts(events: DataFrame, userCol: String, typeCol: String,
             timeCol: String, stages: Seq[String]): DataFrame = {
    val st = stageTimes(events, userCol, typeCol, timeCol, stages)
    val aggs = stages.zipWithIndex.map { case (s, i) =>
      count(col(s"t_$s")).as(s"n$i")
    }
    // stage rows built from literal COLUMNS, not interpolated SQL — a
    // stage name is arbitrary caller data and must never reach a
    // parser (a quote in it would break an expr-built stack())
    val rows = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1L).as("stage_idx"), lit(s).as("stage"),
        col(s"n$i").as("n_users"))
    }
    st.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_users"))
  }

  /** Daily cohort retention: `(cohort_day, day_offset, n_users)` —
    * users are cohorted by the day (µs/86400e6) of their first event;
    * a user counts toward offset k if active on cohort_day + k.
    * Two user-keyed aggregations + one join of users-sized frames;
    * the distinct-day frame is bounded by users × active-days. */
  def retention(events: DataFrame, userCol: String, timeCol: String,
                dayUs: Long = 86400000000L): DataFrame = {
    // floor(double) day arithmetic matches the oracle exactly: epoch-µs
    // values sit far below 2^53, so the division is lossless where it
    // matters (exact multiples of dayUs land on representable doubles)
    def dayOf(c: org.apache.spark.sql.Column) =
      floor(c / lit(dayUs.toDouble)).cast("long")
    val cohort = events.groupBy(col(userCol))
      .agg(dayOf(min(col(timeCol))).as("cohort_day"))
    val active = events
      .select(col(userCol), dayOf(col(timeCol)).as("day"))
      .distinct()
    active.join(cohort, Seq(userCol))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
