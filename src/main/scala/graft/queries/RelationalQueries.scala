package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational query surface over the driver's TPC-H-ish tables,
  * with DuckDB-oracle SQL for every query.
  *
  * Conventions shared by Spark plan and oracle SQL (the driver's
  * compare sorts columns by name then hashes values, so both sides
  * must agree on names, types, and row order):
  *  - every output column aliased identically on both sides;
  *  - computed integers cast to BIGINT on both sides (Spark `year()`
  *    is int32, DuckDB's is int64; DuckDB `sum(int)` is int128);
  *  - double aggregates rounded (sum order differs between engines at
  *    the ulp level; rounding makes them equal);
  *  - a total ORDER BY on every query so row order is deterministic;
  *  - NULLS FIRST spelled out (Spark's ASC default) where rollup/cube
  *    introduce NULLs — DuckDB defaults to NULLS LAST.
  *
  * Scale notes are per query in comments: which joins broadcast, where
  * the shuffles are, what AQE is expected to do at 100 TB.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: one scan, one partial+final hash agg; only the
    // tiny post-agg result shuffles. Scan prunes to 6 columns.
    "q01_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 2).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Predicate + projection pushdown: both reach the parquet scan.
    "q02_filter_project" -> ((s, dir) => {
      import s.implicits._
      // NB: (l_orderkey, l_linenumber) is NOT unique in this synthetic
      // lineitem — order by all output columns for a total order.
      t(s, dir, "lineitem")
        .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
    }),

    // TPC-H Q3 shape: selective dim filter first, two shuffled joins
    // (orderkey is the big axis), top-k via sort+limit (Spark plans
    // TakeOrderedAndProject — no global sort materialization).
    "q03_top_revenue" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      t(s, dir, "orders")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(t(s, dir, "lineitem"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    }),

    // Star-schema agg: both dims broadcast — zero shuffle on the fact
    // side until the final tiny agg.
    "q04_region_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("sum_bal"))
        .orderBy($"r_name")
    }),

    // Left-semi: EXISTS without materializing the right side's columns.
    "q05_semi_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Left-anti: NOT EXISTS (against the F-status subset — every
    // customer has *some* order in this data, so the unfiltered
    // anti-join would be trivially empty).
    "q06_anti_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter($"o_orderstatus" === "F"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Top-N per group: one shuffle on the partition key, rank inside.
    "q07_window_topn" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn".cast("long").as("rn"))
        .orderBy($"o_custkey", $"rn")
    }),

    // Running aggregate window (frame ROWS UNBOUNDED PRECEDING).
    // (l_orderkey, l_linenumber) is not unique → quantity/extendedprice
    // extend the window order to a total order; running_qty joins the
    // final sort so duplicate-keyed output rows order deterministically.
    "q08_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
          round(sum($"l_quantity").over(w), 2).as("running_qty"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
    }),

    // lag(): per-customer order cadence in days.
    "q09_window_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          datediff($"o_orderdate".cast("date"), lag($"o_orderdate".cast("date"), 1).over(w))
            .cast("long").as("gap_days"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q10_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q11_union" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".as("nk"))
        .union(t(s, dir, "supplier").select($"s_nationkey".as("nk")))
        .distinct().orderBy($"nk")
    }),

    "q12_intersect" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".as("nk"))
        .intersect(t(s, dir, "supplier").select($"s_nationkey".as("nk")))
        .orderBy($"nk")
    }),

    "q13_except" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_custkey".as("k"))
        .except(t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_custkey".as("k")))
        .orderBy($"k")
    }),

    // ROLLUP: hierarchical subtotals in one pass (Expand + agg).
    "q14_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    "q15_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("tot"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // count(DISTINCT x), two of them — Spark plans Expand + two-phase agg.
    "q16_count_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_partkey").as("nd_part"),
          countDistinct($"l_suppkey").as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    "q17_having" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(round(sum($"l_quantity"), 2).as("qty"), sum($"l_quantity").as("_raw_qty"))
        .filter($"_raw_qty" > 100)
        .select($"l_partkey", $"qty")
        .orderBy($"l_partkey")
    }),

    "q18_case_buckets" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy(
          when($"l_quantity" < 10, "low")
            .when($"l_quantity" < 30, "mid")
            .otherwise("high").as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg($"l_extendedprice"), 2).as("avg_price"))
        .orderBy($"bucket")
    }),

    "q19_string_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_name".like("%a%"))
        .groupBy(upper(substring($"p_name", 1, 4)).as("prefix"))
        .agg(count(lit(1)).as("n"), max(length($"p_name")).cast("long").as("max_len"))
        .orderBy($"prefix")
    }),

    "q20_date_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mo"))
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("tot"))
        .orderBy($"yr", $"mo")
    }),

    // TPC-H Q5 shape: big fact joins shuffle on orderkey; all the
    // small dims broadcast. AQE re-plans the post-filter sizes at scale.
    "q21_join5" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
        .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .join(broadcast(t(s, dir, "supplier")),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .orderBy($"n_name")
    }),

    // Scalar subquery: the aggregate is computed once and broadcast
    // into the filter — no driver-side collect.
    "q22_scalar_subquery" -> ((s, dir) => {
      import s.implicits._
      val avgPrice = t(s, dir, "orders").agg(avg($"o_totalprice").as("ap"))
      t(s, dir, "orders")
        .crossJoin(broadcast(avgPrice))
        .filter($"o_totalprice" > lit(1.9) * $"ap")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // Global sort + limit → TakeOrderedAndProject (no full sort at scale).
    "q23_topk_global" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(20)
    }),

    // Full outer join: per-nation customer/supplier presence.
    "q25_full_outer" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      val sup = t(s, dir, "supplier").groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
      c.join(sup, $"c_nationkey" === $"s_nationkey", "full_outer")
        .select(coalesce($"c_nationkey", $"s_nationkey").as("nk"),
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"))
        .orderBy($"nk")
    }),

    // GROUPING SETS with grouping_id — finer than rollup/cube.
    "q26_grouping_sets" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq.empty),
          $"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // Ordered array aggregation, emitted as a string for stable compare.
    "q27_array_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .groupBy($"n_regionkey")
        .agg(array_join(slice(sort_array(collect_list($"n_name")), 1, 3), ",")
          .as("first_nations"), count(lit(1)).as("n"))
        .orderBy($"n_regionkey")
    }),

    // Date arithmetic: ship delay in days bucketed per month.
    "q28_date_arith" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .select(year($"o_orderdate").cast("long").as("yr"),
          datediff($"l_shipdate".cast("date"), $"o_orderdate".cast("date")).cast("long")
            .as("delay"))
        .groupBy($"yr")
        .agg(count(lit(1)).as("n"), round(avg($"delay"), 4).as("avg_delay"),
          max($"delay").as("max_delay"))
        .orderBy($"yr")
    }),

    // Regex extraction (shared RE2/Java-compatible pattern).
    "q29_regexp_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"))
        .filter($"brand_num" =!= "")
        .groupBy($"brand_num").agg(count(lit(1)).as("n"))
        .orderBy($"brand_num")
    }),

    // Table profiling in ONE scan: min/max/ndv/null-count per measure
    // column, unpivoted to a row per column — the ANALYZE-style stats
    // pass that informs bucketing/layout/broadcast decisions.
    // Shape (r15): stack FIRST to (cid, v) rows, then a two-level
    // aggregate — level 1 groups by (cid, v), which IS the per-column
    // distinct set (carrying a null count for multiplicity the
    // distinct collapses), level 2 folds it to min/max/ndv/nulls per
    // column. The r14 shape — one multi-distinct aggregate — planned
    // through Expand with gid-null'd replicas: 5× row multiplication,
    // 12 aggregate-buffer updates per expanded row (mostly no-ops on
    // null inputs), and a 17-column partial-buffer shuffle (80.1 MiB
    // at sf0.1). This shape does the same Generate-side 4× row fan-out
    // but only ONE buffer update per row and a 3-column exchange that
    // carries exactly the distinct (cid, value) set — measured 1.77 →
    // 0.87 s warm at sf0.1 (plan diff in plans/r15/q30*). min/max over
    // the distinct values equal min/max over all values; ndv =
    // count(v) over the distinct rows (nulls excluded, as
    // countDistinct); n_nulls = Σ of the level-1 null counts. The
    // integer cid (not the column-name string) keys the hot aggregate.
    "q30_table_profile" -> ((s, dir) => {
      import s.implicits._
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val stackArgs = cols.zipWithIndex
        .map { case (c, i) => s"$i, $c" }.mkString(", ")
      val nameExpr = cols.zipWithIndex
        .map { case (c, i) => s"WHEN $i THEN '$c'" }
        .mkString("CASE cid ", " ", " END")
      t(s, dir, "lineitem")
        .selectExpr(s"stack(${cols.size}, $stackArgs) AS (cid, v)")
        .groupBy($"cid", $"v")
        .agg(count(when($"v".isNull, 1)).as("_nn"))
        .groupBy($"cid")
        .agg(min($"v").as("min_v"), max($"v").as("max_v"),
          count($"v").as("ndv"), sum($"_nn").as("n_nulls"))
        .selectExpr(s"$nameExpr AS column_name",
          "min_v", "max_v", "ndv", "n_nulls")
        .orderBy($"column_name")
    }),

    // The 100 TB twin of q30: same one-scan profile, NDV via
    // approx_count_distinct (HyperLogLog++, default 5% rsd). The exact
    // 4-way countDistinct above plans an Expand that multiplies every
    // scan row x4 before the partial agg — the right shape for an
    // exact oracle, the wrong one for a petabyte ANALYZE pass. HLL
    // sketches are fixed-size per column and merge associatively, so
    // the profile agg is one ordinary partial+final aggregate over the
    // scan: no Expand, no row multiplication (ProfileApproxSpec pins
    // both). HLL values are engine-specific, so the driver-checkable
    // output is the BOUNDED PROPERTY: exact anchors (min/max/nulls and
    // the exact NDV, which DuckDB recomputes) plus an ndv_ok flag
    // asserting |HLL - exact| <= 3*rsd*exact (oracle: literal TRUE).
    // The exact-NDV gate twins are four SINGLE-distinct aggregates —
    // each plans the two-level distinct shape with no Expand — and
    // exist only to make the HLL error envelope oracle-checkable; the
    // production scale path is the profile agg alone.
    "q31_profile_approx" -> ((s, dir) => {
      import s.implicits._
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val base = t(s, dir, "lineitem")
      val aggs = cols.flatMap { c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
          approx_count_distinct(col(c)).as(s"ndv_$c"),
          count(when(col(c).isNull, 1)).as(s"nulls_$c"))
      }
      val one = base.agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(c =>
        s"'$c', min_$c, max_$c, ndv_$c, nulls_$c").mkString(", ")
      val approxProf = one.selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, min_v, max_v, ndv_approx, n_nulls)")
      // production path alone when anchors are gated off (bench mode):
      // the profile agg IS the query; the exact-NDV twins below exist
      // only to make the HLL error envelope oracle-checkable
      if (!Anchors.enabled(s)) approxProf.orderBy($"column_name")
      else {
        val exactNdv = cols.map(c =>
            base.agg(countDistinct(col(c)).as("ndv"))
              .select(lit(c).as("column_name"), $"ndv".as("ndv")))
          .reduce(_ unionAll _)
        approxProf.join(broadcast(exactNdv), Seq("column_name"))
          .select($"column_name", $"min_v", $"max_v", $"ndv", $"n_nulls",
            (abs($"ndv_approx" - $"ndv").cast("double") <=
              greatest(lit(1.0), $"ndv" * 0.15)).as("ndv_ok"))
          .orderBy($"column_name")
      }
    }),

    // Distribution-rank windows: ntile quartiles, percent_rank,
    // cume_dist — via Skew.distributionRanks, NOT a plain
    // `Window.partitionBy(o_orderpriority)`: the key has 5 values, so
    // the plain window buffers a fifth of orders in ONE task and its
    // state doubles every rung (the r11 preventive gate measured
    // 288 MB at sf10 → 576 MB at sf20, over the 512 MB budget).
    // Value-range shards split each priority adaptively; the orderkey
    // tiebreak makes every row its own peer group, so all three
    // functions are exact rationals of (rank, n) — identical IEEE
    // division on both engines; rounded at 6dp anyway for
    // belt-and-braces.
    "q32_window_dist" -> ((s, dir) => {
      import s.implicits._
      val ranked = graft.operators.Skew.distributionRanks(
        t(s, dir, "orders")
          .select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
        "o_orderpriority", "o_totalprice", "o_orderkey")
      ranked.select($"o_orderpriority", $"o_orderkey",
          graft.operators.Skew.ntileFromRank($"rank", $"n", 4).as("quartile"),
          round(when($"n" === 1L, 0.0)
            .otherwise(($"rank" - 1L).cast("double") / ($"n" - 1L)), 6)
            .as("pct_rank"),
          round($"rank".cast("double") / $"n", 6).as("cum_dist"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),

    // Manually salted skew join under the gate: 70% of lineitem rows
    // collapse onto one hot supplier key (manufactured heavy hitter —
    // the host-/boilerplate-key shape web corpora produce), then
    // Skew.saltedJoin scatters the probe side across 8 salt buckets
    // with the build side replicated to match. Result must equal the
    // plain join exactly (the oracle IS the plain join) — the salt is
    // a physical rewrite, never a semantic one. For AQE-reachable
    // sort-merge joins prefer spark.sql.adaptive.skewJoin; this
    // primitive covers the broadcast-infeasible residue.
    "q33_salted_join" -> ((s, dir) => {
      import s.implicits._
      val big = t(s, dir, "lineitem")
        .select(when($"l_orderkey" % 10 < 7, 1L).otherwise($"l_suppkey").as("skey"),
          $"l_quantity")
      val small = t(s, dir, "supplier")
        .select($"s_suppkey".as("skey"), $"s_nationkey")
      graft.operators.Skew.saltedJoin(big, small, Seq("skey"), saltBuckets = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .orderBy($"s_nationkey")
    }),

    // Join on computed key + range predicate (non-equi residual).
    "q24_theta_join" -> ((s, dir) => {
      import s.implicits._
      val p = t(s, dir, "part").filter($"p_size" >= 48)
      t(s, dir, "lineitem")
        .join(broadcast(p), $"l_partkey" === $"p_partkey" && $"l_quantity" > $"p_size")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .orderBy($"p_brand")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |round(avg(l_quantity),2) AS avg_qty, round(avg(l_discount),4) AS avg_disc,
        |count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q03_top_revenue" ->
      """SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_region_rollup" ->
      """SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q07_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) sub
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q08_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,

    "q09_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(date_diff('day',
        |  lag(CAST(o_orderdate AS DATE), 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q10_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q11_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,

    "q12_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,

    "q13_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""".stripMargin,

    "q14_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q15_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS tot
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q16_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        |count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q17_having" ->
      """SELECT l_partkey, round(sum(l_quantity),2) AS qty FROM lineitem
        |GROUP BY l_partkey HAVING sum(l_quantity) > 100 ORDER BY l_partkey""".stripMargin,

    "q18_case_buckets" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid'
        |ELSE 'high' END AS bucket, count(*) AS n, round(avg(l_extendedprice),2) AS avg_price
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q19_string_funcs" ->
      """SELECT upper(substr(p_name,1,4)) AS prefix, count(*) AS n,
        |CAST(max(length(p_name)) AS BIGINT) AS max_len
        |FROM part WHERE p_name LIKE '%a%' GROUP BY prefix ORDER BY prefix""".stripMargin,

    "q20_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
        |count(*) AS n, round(sum(o_totalprice),2) AS tot
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,

    "q21_join5" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q22_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q23_topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,

    "q25_full_outer" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nk,
        |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey ORDER BY nk""".stripMargin,

    "q26_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q27_array_agg" ->
      """SELECT n_regionkey,
        |       array_to_string(list_sort(list(n_name))[1:3], ',') AS first_nations,
        |       count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q28_date_arith" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n,
        |round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4) AS avg_delay,
        |CAST(max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS max_delay
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY yr ORDER BY yr""".stripMargin,

    "q29_regexp_extract" ->
      """SELECT brand_num, count(*) AS n FROM (
        |  SELECT regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num FROM part) t
        |WHERE brand_num <> '' GROUP BY brand_num ORDER BY brand_num""".stripMargin,

    "q30_table_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS column_name, min($c) AS min_v, max($c) AS max_v,
           |count(DISTINCT $c) AS ndv,
           |count(*) FILTER (WHERE $c IS NULL) AS n_nulls FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),

    // bounded-property oracle: exact anchors recomputed by DuckDB;
    // ndv_ok (|HLL - exact| within 3*rsd) must be literally TRUE.
    "q31_profile_approx" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS column_name, min($c) AS min_v, max($c) AS max_v,
           |count(DISTINCT $c) AS ndv,
           |count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
           |TRUE AS ndv_ok FROM lineitem""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),

    "q24_theta_join" ->
      """SELECT p_brand, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
        |WHERE p_size >= 48 GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // the PLAIN join — equality proves the salt rewrote physics only
    "q33_salted_join" ->
      """WITH big AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1 ELSE l_suppkey END AS skey,
        |         l_quantity
        |  FROM lineitem)
        |SELECT s_nationkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM big JOIN supplier ON skey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q32_window_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        |CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |round(percent_rank() OVER w, 6) AS pct_rank,
        |round(cume_dist() OVER w, 6) AS cum_dist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
  )
}
