package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over `events`.
  *
  * The `ts` column is parquet `timestamp[ns]`. Spark has no nanosecond
  * timestamp type, so the session reads it as a raw long
  * (`spark.sql.legacy.parquet.nanosAsLong=true`); DuckDB converts it to
  * a microsecond TIMESTAMP by floor division. Queries therefore work in
  * epoch-microseconds (`ts div 1000` ≡ DuckDB `epoch_us(ts)`), which
  * keeps the two engines bit-identical.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** 30-minute inactivity gap, in microseconds — aliased from the
    * operator so batch query, streaming twin, and oracle SQL (which
    * interpolates this value) share one definition. */
  val SessionGapUs: Long = graft.operators.Sessionize.DefaultGapUs

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessionization via the library operator
    // ([[graft.operators.Sessionize]]): one shuffle on user_id, two
    // window passes + the session aggregate on the same partitioning.
    // The streaming twin lives in graft.streaming.StreamingSessionize.
    "e01_sessionize" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Sessionize.sessions(
          ev(s, dir).select($"user_id", $"event_id", expr("ts div 1000").as("tus")),
          "user_id", "tus", "event_id", SessionGapUs)
        .orderBy($"user_id", $"session_id")
    }),

    // The STREAMING twin of e01, under the same oracle: drain the
    // events table through flatMapGroupsWithState with AvailableNow
    // and return the completed sessions. Batch equality holds because
    // the bounded drain delivers each user's events event-time-ordered
    // (single data batch) and the sentinel watermark push flushes every
    // session — see StreamingJobs for the mechanics.
    "e05_stream_sessionize" -> ((s, dir) =>
      graft.streaming.StreamingJobs.sessionizeAvailableNow(s, dir)),

    // Streaming tumbling-window counts (the third streaming operator)
    // under the oracle gate — same drain + sentinel-flush mechanics.
    "e06_stream_windows" -> ((s, dir) =>
      graft.streaming.StreamingJobs.windowCountsAvailableNow(s, dir)),

    // STREAM-STREAM range join: streaming purchases ⋈ streaming views
    // within the hour band, aggregated to a02's exact shape and
    // checked against a02's EXACT oracle — batch and streaming range
    // joins must agree row-for-row. Inner matches emit on arrival (no
    // sentinel); the band condition doubles as the state-eviction
    // bound (see StreamingRangeJoin).
    // STREAMING anomaly detection: each hourly (window, event_type)
    // count compared against its trailing baseline — the sum of the
    // previous 6 OBSERVED windows of that type. The streaming part is
    // e06's windowed-count state (reused through the drain memo: same
    // jobTag + params → the sink is drained ONCE for both queries);
    // the trailing comparison is a batch window over the drained,
    // BOUNDED windows frame (windows-in-range × types, never event
    // rows) — the "windows over outputs" pattern. Integer lift_ppm
    // (floor((n·6·10⁶)/baseline)) keeps the oracle exact; a window
    // counts as anomalous when it runs ≥2× hot or ≤0.5× cold vs the
    // trailing mean. Rows without a full 6-window history carry no
    // verdict and are dropped — the detector needs its warm-up.
    "e19_stream_anomaly" -> ((s, dir) => {
      import s.implicits._
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"window_start_us")
        .rowsBetween(-6, -1)
      graft.streaming.StreamingJobs.windowCountsAvailableNow(s, dir)
        .withColumn("baseline_n", sum($"n").over(win))
        .withColumn("_prior", count(lit(1)).over(win))
        .filter($"_prior" === 6)
        .select($"window_start_us", $"event_type", $"n", $"baseline_n",
          expr("(n * 6 * 1000000L) div baseline_n").as("lift_ppm"))
        .withColumn("is_anomaly",
          ($"lift_ppm" >= 2000000L || $"lift_ppm" <= 500000L).cast("long"))
        .orderBy($"window_start_us", $"event_type")
    }),

    "e07_stream_range_join" -> ((s, dir) =>
      graft.streaming.StreamingJobs.rangeJoinAvailableNow(s, dir)),

    // e01's semantics through Spark's NATIVE session_window generator
    // (the same merge machinery Structured Streaming uses for
    // streaming session aggregation) instead of the hand-rolled
    // lag+cumsum operator — one groupBy, no window-function passes.
    // Boundary contract verified by differential test (NewQueriesR7
    // Spec): an event at EXACTLY prev + gap merges into the running
    // session — diff > gap starts a new one — identical to the lag
    // operator, so the oracle reuses e01's > chain with sessions
    // keyed by start time (what session_window emits) not ordinal.
    "e14_native_sessions" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .select($"user_id", expr("ts div 1000").as("tus"))
        .withColumn("tsc", timestamp_micros($"tus"))
        .groupBy($"user_id",
          session_window($"tsc", s"$SessionGapUs microseconds").as("win"))
        .agg(max($"tus").as("session_end_us"), count(lit(1)).as("n_events"))
        .select($"user_id", unix_micros($"win.start").as("session_start_us"),
          $"session_end_us", $"n_events")
        .orderBy($"user_id", $"session_start_us")
    }),

    // The STREAMING twin of e14 under the SAME oracle: native
    // session_window aggregation with Spark's built-in session state
    // store (merge-on-arrival, watermark eviction, append-mode emit on
    // close) — engine-managed session state, where e05 manages it by
    // hand in flatMapGroupsWithState. Sentinel flush as in e05/e06.
    "e15_stream_session_window" -> ((s, dir) =>
      graft.streaming.StreamingJobs.sessionWindowAvailableNow(s, dir)),

    // STREAMING data-quality gate — x19's streaming twin: hard
    // constraints + screens per tumbling hour, every rule folded into
    // ONE windowed aggregate (a handful of longs per open window),
    // flushed append-mode as the watermark closes each hour.
    "e16_stream_dq" -> ((s, dir) =>
      graft.streaming.StreamingJobs.dqAuditAvailableNow(s, dir)),

    // STREAMING zone-map maintenance — x24's incremental twin: each
    // hour's block statistics (count + id ranges) flushed once as the
    // watermark closes the hour, so layout stats stay fresh without
    // rescanning the table.
    "e17_stream_zone_maps" -> ((s, dir) =>
      graft.streaming.StreamingJobs.zoneMapsAvailableNow(s, dir)),

    // STREAMING exact COUNT(DISTINCT) per window: keyed dedup state
    // chained into a windowed count, both evicted by the same
    // hour-bucket watermark — the exact-cardinality pattern where the
    // sketch answer isn't acceptable.
    "e18_stream_window_users" -> ((s, dir) =>
      graft.streaming.StreamingJobs.windowUsersAvailableNow(s, dir)),

    "e02_type_stats" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"),
          round(avg($"value"), 4).as("avg_value"))
        .orderBy($"event_type")
    }),

    // Tumbling 1-hour windows with distinct-user counts.
    "e03_hourly" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(expr("(ts div 1000) div 3600000000").as("hour_bucket"))
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"),
          round(sum($"value"), 2).as("sum_value"))
        .orderBy($"hour_bucket")
    }),

    // SLIDING windows: 1-hour length, 30-minute slide — every event
    // lands in exactly two overlapping windows via Spark's native
    // window() generator (a codegen'd explode, then the same
    // partial+final agg as tumbling).
    "e12_sliding_windows" -> ((s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("ts_micro", timestamp_micros(expr("ts div 1000")))
        .groupBy(window($"ts_micro", "1 hour", "30 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"))
        .select(unix_micros($"window.start").as("window_start_us"),
          $"event_type", $"n", $"n_users")
        .orderBy($"window_start_us", $"event_type")
    }),

    // Per-user activity profile: event span, rate, dominant type.
    // Deliberately TWO pruned scans, not a shared reuse-anchor: each
    // branch reads disjoint columns (user+ts vs user+type) from the
    // columnar store and partial-aggregates BEFORE its shuffle, so the
    // exchanges carry tiny combined rows. An anchor exchange would
    // shuffle raw events — the reuse-anchor pattern pays only when the
    // shared subtree is expensive compute (tokenize), not a cheap
    // column-pruned scan.
    "e04_user_profile" -> ((s, dir) => {
      import s.implicits._
      val byType = ev(s, dir)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"user_id").orderBy($"cnt".desc, $"event_type")
      val top = byType.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type".as("top_type"))
      ev(s, dir)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          (max(expr("ts div 1000")) - min(expr("ts div 1000"))).as("span_us"))
        .join(top, "user_id")
        .select($"user_id", $"n_events", $"span_us", $"top_type")
        .orderBy($"user_id")
    }),

    // Ordered funnel signup → view → click → purchase via sequential
    // minima: each later stage counts only events at/after the user's
    // reaching time of the previous stage. K user-keyed passes, never
    // a pair blowup.
    "e08_funnel" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Funnel.counts(
          ev(s, dir).select($"user_id", $"event_type",
            expr("ts div 1000").as("tus")),
          "user_id", "event_type", "tus", FunnelStages)
        .orderBy($"stage_idx")
    }),

    // The STREAMING twin of e08 under the identical oracle: per-user
    // stage state folds incrementally, flushed by event-time timeout
    // once the sentinel pushes the watermark past every horizon.
    "e10_stream_funnel" -> ((s, dir) =>
      graft.streaming.StreamingJobs.funnelAvailableNow(s, dir)),

    // Streaming exact heavy hitters: one counter per user in state,
    // flushed by event-time timeout — equals the batch GROUP BY ...
    // HAVING count >= 70 under the same oracle shape as t14's settle.
    "e11_stream_heavy_users" -> ((s, dir) =>
      graft.streaming.StreamingJobs.heavyUsersAvailableNow(s, dir)),

    // STREAMING sliding windows (1h/30min): the overlapping-window
    // twin of e06's tumbling drain — each event feeds two windows,
    // state still per (window x type), append-mode once-per-window.
    "e13_stream_sliding" -> ((s, dir) =>
      graft.streaming.StreamingJobs.windowCountsAvailableNow(s, dir,
        slide = Some("30 minutes"), jobTag = "e13")),

    // Daily cohort retention: users cohorted by first-event day,
    // counted on each day-offset they were active.
    "e09_retention" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Funnel.retention(
          ev(s, dir).select($"user_id", expr("ts div 1000").as("tus")),
          "user_id", "tus")
        .orderBy($"cohort_day", $"day_offset")
    }),
  )

  private val FunnelStages = graft.operators.Funnel.EventStages

  /** Oracle for e08, generated from [[FunnelStages]] so the stage list
    * cannot drift between the Spark plan and the SQL. */
  private def funnelOracleSql: String = {
    val ctes = FunnelStages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"s1 AS (SELECT user_id, min(tus) AS t1 FROM e WHERE event_type = '$st' GROUP BY user_id)"
      else
        s"""s${i + 1} AS (SELECT e.user_id, min(tus) AS t${i + 1} FROM e
           |  JOIN s$i USING (user_id)
           |  WHERE event_type = '$st' AND tus >= t$i GROUP BY e.user_id)""".stripMargin
    }
    val rows = FunnelStages.zipWithIndex.map { case (st, i) =>
      s"(CAST(${i + 1} AS BIGINT), '$st', (SELECT count(*) FROM s${i + 1}))"
    }
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       |${ctes.mkString(",\n")}
       |SELECT * FROM (VALUES ${rows.mkString(", ")}) t(stage_idx, stage, n_users)
       |ORDER BY stage_idx""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "e01_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
         |w AS (SELECT user_id, event_id, tus,
         |        CASE WHEN lag(tus, 1) OVER win IS NULL
         |                  OR tus - lag(tus, 1) OVER win > $SessionGapUs
         |             THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (SELECT user_id, tus,
         |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |      FROM w)
         |SELECT user_id, session_id, CAST(min(tus) AS BIGINT) AS session_start_us,
         |       CAST(max(tus) AS BIGINT) AS session_end_us, count(*) AS n_events
         |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    // identical SQL to e01: the streaming run must reproduce the batch
    // sessionizer exactly (same gap, same tie order, every session
    // flushed)
    "e05_stream_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
         |w AS (SELECT user_id, event_id, tus,
         |        CASE WHEN lag(tus, 1) OVER win IS NULL
         |                  OR tus - lag(tus, 1) OVER win > $SessionGapUs
         |             THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (SELECT user_id, tus,
         |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |      FROM w)
         |SELECT user_id, session_id, CAST(min(tus) AS BIGINT) AS session_start_us,
         |       CAST(max(tus) AS BIGINT) AS session_end_us, count(*) AS n_events
         |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    // e01's chain (same > boundary — differential-tested); session
    // identity by start time, not ordinal, because that's what
    // session_window emits
    "e14_native_sessions" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
         |w AS (SELECT user_id, event_id, tus,
         |        CASE WHEN lag(tus, 1) OVER win IS NULL
         |                  OR tus - lag(tus, 1) OVER win > $SessionGapUs
         |             THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (SELECT user_id, tus,
         |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
         |      FROM w)
         |SELECT user_id, CAST(min(tus) AS BIGINT) AS session_start_us,
         |       CAST(max(tus) AS BIGINT) AS session_end_us, count(*) AS n_events
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,

    // identical SQL to e14: the streaming native-session-window run
    // must reproduce the batch generator exactly (same gap, same >
    // boundary, every tail session flushed by the sentinel)
    "e15_stream_session_window" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
         |w AS (SELECT user_id, event_id, tus,
         |        CASE WHEN lag(tus, 1) OVER win IS NULL
         |                  OR tus - lag(tus, 1) OVER win > $SessionGapUs
         |             THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (SELECT user_id, tus,
         |        CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
         |      FROM w)
         |SELECT user_id, CAST(min(tus) AS BIGINT) AS session_start_us,
         |       CAST(max(tus) AS BIGINT) AS session_end_us, count(*) AS n_events
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,

    "e06_stream_windows" ->
      """SELECT CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT) AS window_start_us,
        |event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // batch replay of the hourly counts + the same trailing-6-window
    // frame; all integer (floor division) so the verdicts are exact
    "e19_stream_anomaly" ->
      """WITH w AS (
        |  SELECT CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT)
        |      AS window_start_us,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT window_start_us, event_type, n,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY window_start_us
        |                 ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS baseline_n,
        |    count(*) OVER (PARTITION BY event_type ORDER BY window_start_us
        |                   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS prior
        |  FROM w)
        |SELECT window_start_us, event_type, CAST(n AS BIGINT) AS n,
        |  CAST(baseline_n AS BIGINT) AS baseline_n,
        |  CAST((n * 6 * 1000000) // baseline_n AS BIGINT) AS lift_ppm,
        |  CAST(CASE WHEN (n * 6 * 1000000) // baseline_n >= 2000000
        |              OR (n * 6 * 1000000) // baseline_n <= 500000
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM b WHERE prior = 6
        |ORDER BY window_start_us, event_type""".stripMargin,

    // batch replay of the hourly rule aggregate, melted by UNION ALL
    "e16_stream_dq" ->
      """WITH a AS (
        |  SELECT CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT) AS w,
        |    count(*) AS n,
        |    sum(CASE WHEN coalesce(NOT (value >= 0 AND value <= 500), TRUE) THEN 1 ELSE 0 END) AS value_range,
        |    sum(CASE WHEN coalesce(event_type NOT IN ('click','error','purchase','signup','view'), TRUE) THEN 1 ELSE 0 END) AS type_domain,
        |    sum(CASE WHEN coalesce(value > 400, TRUE) THEN 1 ELSE 0 END) AS screen_big_value,
        |    sum(CASE WHEN coalesce(event_type = 'error', TRUE) THEN 1 ELSE 0 END) AS screen_error
        |  FROM events GROUP BY 1)
        |SELECT w AS window_start_us, "check", CAST(n AS BIGINT) AS n_events,
        |       CAST(nv AS BIGINT) AS n_violations
        |FROM (
        |  SELECT w, n, 'screen_big_value' AS "check", screen_big_value AS nv FROM a
        |  UNION ALL SELECT w, n, 'screen_error', screen_error FROM a
        |  UNION ALL SELECT w, n, 'type_domain', type_domain FROM a
        |  UNION ALL SELECT w, n, 'value_range', value_range FROM a)
        |ORDER BY window_start_us, "check"""".stripMargin,

    // batch replay: plain per-hour exact distinct users
    "e18_stream_window_users" ->
      """SELECT CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT)
        |    AS window_start_us,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // batch replay of the hourly zone-map aggregate
    "e17_stream_zone_maps" ->
      """SELECT CAST((epoch_us(ts) // 3600000000) * 3600000000 AS BIGINT)
        |    AS window_start_us,
        |  count(*) AS n_rows, min(user_id) AS min_uid, max(user_id) AS max_uid,
        |  min(event_id) AS min_eid, max(event_id) AS max_eid
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "e13_stream_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    (epoch_us(ts) // 1800000000) * 1800000000 AS b
        |  FROM events),
        |x AS (SELECT event_type, value,
        |        unnest([b, b - 1800000000]) AS window_start_us FROM e)
        |SELECT CAST(window_start_us AS BIGINT) AS window_start_us, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // literally a02's oracle: the streaming range join must reproduce
    // the batch range join exactly
    "e07_stream_range_join" -> AdvancedQueries.oracles("a02_range_join"),

    "e02_type_stats" ->
      """SELECT event_type, count(*) AS n, round(sum(value),2) AS sum_value,
        |round(avg(value),4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e03_hourly" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, count(*) AS n,
        |count(DISTINCT user_id) AS n_users, round(sum(value),2) AS sum_value
        |FROM events GROUP BY hour_bucket ORDER BY hour_bucket""".stripMargin,

    // a 1h/30min sliding window covers event t iff its start s (a 30min
    // multiple) satisfies t-3600e6 < s <= t: exactly the 30min bucket
    // of t and the one before it
    "e12_sliding_windows" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    (epoch_us(ts) // 1800000000) * 1800000000 AS b
        |  FROM events),
        |x AS (SELECT user_id, event_type,
        |        unnest([b, b - 1800000000]) AS window_start_us FROM e)
        |SELECT window_start_us, event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users
        |FROM x GROUP BY window_start_us, event_type
        |ORDER BY window_start_us, event_type""".stripMargin,

    "e04_user_profile" ->
      """WITH bytype AS (
        |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY user_id, event_type),
        |top AS (
        |  SELECT user_id, event_type AS top_type FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
        |    FROM bytype) r WHERE rn = 1),
        |prof AS (
        |  SELECT user_id, count(*) AS n_events,
        |         CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS span_us
        |  FROM events GROUP BY user_id)
        |SELECT p.user_id, p.n_events, p.span_us, t.top_type
        |FROM prof p JOIN top t ON p.user_id = t.user_id
        |ORDER BY p.user_id""".stripMargin,

    "e08_funnel" -> funnelOracleSql,

    // identical SQL to e08: the streaming fold must reproduce the
    // batch sequential-minima funnel exactly
    "e10_stream_funnel" -> funnelOracleSql,

    "e11_stream_heavy_users" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |GROUP BY user_id HAVING count(*) >= 70
        |ORDER BY user_id""".stripMargin,

    "e09_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |c AS (SELECT user_id,
        |        CAST(floor(CAST(min(tus) AS DOUBLE) / 86400000000) AS BIGINT) AS cohort_day
        |      FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |        CAST(floor(CAST(tus AS DOUBLE) / 86400000000) AS BIGINT) AS day
        |      FROM e)
        |SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
  )
}
