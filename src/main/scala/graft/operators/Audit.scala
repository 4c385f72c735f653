package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit: declarative constraint checks over a table,
  * reported as violation counts. Before a corpus or fact table feeds
  * training, a pipeline gates on exactly this — null/range/domain
  * violations per column, key uniqueness, and referential integrity
  * against dimension tables — and the gate must be one cheap pass,
  * not a query per rule.
  *
  * Scale shape: [[ruleAudit]] folds EVERY rule into one partial+final
  * aggregate over a single scan — agg state is one long per rule, so
  * 50 rules over 100 TB still cost one scan and a constant-size
  * exchange. The melt to (check, count) rows happens on the
  * aggregate's single output row. [[orphanCount]] is one equi-join
  * hashed on the key against the DISTINCT parent keys — AQE
  * broadcasts the parent side when it is dimension-sized.
  */
object Audit {

  /** Audit `df` against `rules` — each `(name, violationPred)` where
    * the predicate is TRUE when the row VIOLATES the constraint (a
    * null predicate counts as a violation: constraints must evaluate
    * decisively). Returns one row per rule:
    * `(tbl, check, n_checked, n_violations)`.
    */
  def ruleAudit(df: DataFrame, table: String,
                rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("_n") +:
      rules.map { case (name, pred) =>
        sum(coalesce(pred, lit(true)).cast("long")).as(s"_v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) =>
      s"'$name', _v_$name"
    }.mkString(", ")
    one.selectExpr("_n",
        s"stack(${rules.size}, $stackArgs) AS (check, n_violations)")
      .select(lit(table).as("tbl"), col("check"),
        col("_n").as("n_checked"), col("n_violations"))
  }

  /** Uniqueness check on a key: violations = rows beyond the first
    * per key value (0 when the key is unique). Single-distinct
    * aggregate — no Expand is planned for one distinct column.
    */
  def uniqueness(df: DataFrame, table: String, keyCol: String): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col(keyCol))).as("n_violations"))
      .select(lit(table).as("tbl"),
        lit(s"unique_$keyCol").as("check"),
        col("n_checked"), col("n_violations"))

  /** Referential integrity: child rows whose `childKey` has no match
    * in `parent.parentKey`. NULL child keys are orphans too — a fact
    * row that cannot be joined to its dimension is broken either way.
    *
    * Scale shape: the child side pre-aggregates to `(key, count)`
    * BEFORE the join — map-side partial aggregation collapses repeats
    * per input split, so the exchange carries ≤ distinct child keys
    * (for a lineitem→orders check, keys not lines: the r9 sf10 audit
    * measured the unaggregated form shuffling every child row's key
    * once the parent outgrew broadcast). Both the child aggregate and
    * the parent distinct hash on the same key, so the left join that
    * follows reuses their partitioning — total exchange = distinct
    * child keys + distinct parent keys, whatever the fact-table row
    * count. NULL keys form their own group and never match (left join
    * semantics) — counted as violations, same as row-at-a-time. */
  def orphanCount(child: DataFrame, table: String, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame = {
    val perKey = child.groupBy(col(childKey).as("_ck"))
      .agg(count(lit(1)).as("_cnt"))
    val keys = parent.select(col(parentKey).as("_pk")).distinct()
    perKey.join(keys, col("_ck") === col("_pk"), "left")
      .agg(coalesce(sum(col("_cnt")), lit(0L)).as("n_checked"),
        coalesce(sum(when(col("_pk").isNull, col("_cnt")).otherwise(lit(0L))),
          lit(0L)).as("n_violations"))
      .select(lit(table).as("tbl"),
        lit(s"fk_${childKey}_to_$parentKey").as("check"),
        col("n_checked"), col("n_violations"))
  }
}
