package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus version history: collapse per-version observations into
  * SCD-type-2 validity intervals. A training-data pipeline re-crawls
  * and re-curates; downstream consumers need "which content was live
  * in which corpus version" without storing every version in full —
  * the classic slowly-changing-dimension shape, applied to document
  * digests instead of warehouse dimensions.
  *
  * Scale shape: ONE window pass partitioned by the entity id (run
  * detection via lag + running sum — no self-join), then a partial+
  * final aggregate on (id, run). Everything shuffles once, hashed on
  * the id; interval state is two longs per run. At 100 TB the input
  * is (version, id, digest) — digests only, never the payload.
  */
object History {

  /** Collapse `(versionCol, idCol, digestCol)` observations into
    * maximal runs of consecutive versions with unchanged digest.
    * A version gap (entity absent from a snapshot) ends the run even
    * if the digest returns unchanged — absence is a real deletion
    * interval. Returns `(idCol, v_from, v_to, digest)`, one row per
    * run. Deterministic: pure integer/string comparisons.
    */
  def scd2(rows: DataFrame, idCol: String, versionCol: String,
           digestCol: String): DataFrame = {
    val id = col(idCol)
    val v = col(versionCol)
    val dg = col(digestCol)
    val w = Window.partitionBy(id).orderBy(v)
    val runFlagged = rows
      .withColumn("_new_run",
        when(lag(dg, 1).over(w).isNull ||
          lag(dg, 1).over(w) =!= dg ||
          lag(v, 1).over(w) =!= v - 1, 1L).otherwise(0L))
      .withColumn("_run", sum(col("_new_run")).over(w))
    runFlagged.groupBy(id, col("_run"))
      .agg(min(v).as("v_from"), max(v).as("v_to"), min(dg).as("digest"))
      .drop("_run")
  }

  /** Point-in-time lookup against an scd2 history: for each probe
    * row, the run whose `[v_from, v_to]` contains `atCol` — the
    * feature-store read path ("the entity's state AT version v",
    * never leaking a future revision into training features). LEFT
    * join so probes that land in a deletion gap survive with null
    * history columns instead of vanishing.
    *
    * Scale shape: one equi-join hashed on the entity id with the
    * validity interval as a residual predicate. Runs per id are few
    * by construction — collapsing versions into runs is the whole
    * point of SCD2 — so the residual never multiplies. No snapshot
    * materialization, no per-version explosion.
    */
  def pitLookup(hist: DataFrame, probes: DataFrame, idCol: String,
                atCol: String): DataFrame =
    probes.join(hist,
        probes(idCol) === hist(idCol) &&
          probes(atCol) >= hist("v_from") && probes(atCol) <= hist("v_to"),
        "left")
      .drop(hist(idCol))

  /** Apply a CDC changelog to a snapshot: latest-wins merge. `log`
    * carries `(keyCol, payload…, seqCol, opCol)` with op `"U"`
    * (upsert) or `"D"` (delete); `snapshot` carries `(keyCol,
    * payload…)` and is treated as an upsert at sequence 0. `(key,
    * seq)` must be unique — a changelog with ambiguous ordering is a
    * broken changelog, not a tiebreak problem. Returns the merged
    * live rows `(keyCol, payload…, last_seq)`; keys whose final op is
    * a delete are dropped.
    *
    * Scale shape: ONE shuffle hashed on the key — `max_by(payload,
    * seq)` aggregates with map-side partials, so each partition
    * contributes at most one candidate row per key to the exchange.
    * No join, no window sort, no per-version materialization: exactly
    * the MERGE-into-snapshot shape a 100 TB table maintenance pass
    * wants.
    */
  def applyChangelog(snapshot: DataFrame, log: DataFrame, keyCol: String,
                     seqCol: String, opCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == keyCol).toSeq
    val ordered = (keyCol +: payload) ++ Seq(seqCol, opCol)
    val base = snapshot
      .withColumn(seqCol, lit(0L))
      .withColumn(opCol, lit("U"))
      .select(ordered.map(col): _*)
    val all = base.unionByName(log.select(ordered.map(col): _*))
    all.groupBy(col(keyCol))
      .agg(
        max_by(struct((payload :+ opCol).map(col): _*), col(seqCol)).as("_last"),
        max(col(seqCol)).as("last_seq"))
      .filter(col(s"_last.$opCol") =!= "D")
      .select(col(keyCol) +: payload.map(c => col(s"_last.$c").as(c))
        :+ col("last_seq"): _*)
  }

  /** Incremental view maintenance: carry a grouped (count, sum)
    * aggregate across a changelog WITHOUT recomputing it from the new
    * snapshot. `v1` is the standing view (count + sum of `valCol` per
    * `groupCol` — in production it is STORED, here recomputed as the
    * starting point); the maintenance path touches only:
    *
    *  1. the changelog, collapsed to one final op per key (one
    *     log-sized shuffle — never the snapshot);
    *  2. the snapshot rows for CHANGED keys only (equi-join on the
    *     key; at scale the collapsed changelog broadcasts and prunes
    *     the snapshot scan);
    *  3. contribution rows — (-1, -old_val) under the old group,
    *     (+1, +new_val) under the new group (group moves included) —
    *     aggregated into a group-sized delta and outer-merged into v1.
    *
    * At 100 TB with a 0.1% daily churn, that is the difference
    * between re-aggregating 100 TB and shuffling ~100 GB of deltas.
    * Groups whose count reaches zero drop out. Output:
    * `(groupCol, n_rows, sum_val)`.
    */
  def incrementalAgg(snapshot: DataFrame, log: DataFrame, keyCol: String,
                     groupCol: String, valCol: String, seqCol: String,
                     opCol: String): DataFrame = {
    val v1 = snapshot.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(valCol)).as("sum_val"))
    val lastOps = log.groupBy(col(keyCol))
      .agg(max_by(struct(col(groupCol), col(valCol), col(opCol)),
        col(seqCol)).as("_last"))
      .select(col(keyCol), col(s"_last.$groupCol").as("_g_new"),
        col(s"_last.$valCol").as("_v_new"), col(s"_last.$opCol").as("_op"))
    val neg = lastOps.join(snapshot, Seq(keyCol))
      .select(col(groupCol).as("_g"), lit(-1L).as("_dn"),
        (-col(valCol)).as("_dv"))
    val pos = lastOps.filter(col("_op") === "U")
      .select(col("_g_new").as("_g"), lit(1L).as("_dn"), col("_v_new").as("_dv"))
    val delta = neg.unionByName(pos).groupBy(col("_g"))
      .agg(sum(col("_dn")).as("_dn"), sum(col("_dv")).as("_dv"))
    v1.join(delta, v1(groupCol) === delta("_g"), "full_outer")
      .select(coalesce(v1(groupCol), col("_g")).as(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_val"), lit(0L)) + coalesce(col("_dv"), lit(0L)))
          .as("sum_val"))
      .filter(col("n_rows") > 0)
  }
}
