package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** End-to-end training-corpus curation — the composition a real
  * LLM-data pipeline runs over raw documents, as ONE operator:
  *
  *   score (lang-ID + quality) → filter → exact dedup (keep min id)
  *     → near-dup removal (MinHash-LSH, drop the larger id of a pair)
  *
  * Scale shape: scoring is one whole-stage-codegen scan (tokens
  * materialize once, every statistic reads the bound attribute);
  * filters run BEFORE any shuffle so the expensive stages see only
  * surviving rows; exact dedup groups on a 16-byte digest (never raw
  * text); near-dup is the banded LSH path ([[Dedup.minHashPairs]] —
  * linear candidate generation). Every stage is deterministic, so the
  * whole pipeline carries an exact oracle (p01).
  *
  * Near-dup removal convention: for every verified pair (a < b,
  * jaccard ≥ threshold) the LARGER id is dropped — non-transitive by
  * design (b dropped for (a,b) does not protect c in (b,c)): the rule
  * is a pure function of the pair set, which keeps it reproducible
  * across partitionings and expressible in plain SQL.
  */
object Curation {

  /** Filter thresholds; near-dup stage disabled with `nearDupJaccard = None`. */
  case class Config(lang: String = "en", minTokens: Long = 30L,
                    minAlnumRatio: Double = 0.5,
                    nearDupJaccard: Option[Double] = Some(0.5))

  /** `(id, text)` → surviving docs as `(id, pred_lang, n_tokens,
    * alnum_ratio)`, one scoring scan + digest dedup + LSH near-dup. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame = {
    val scored = docs
      .select(col(idCol), col(textCol).as("_text"), tokenize(col(textCol)).as("_toks"))
      .select(col(idCol), col("_text"), col("_toks"),
        TextAnalysis.langIdFromTokens(col("_toks")).as("pred_lang"),
        size(col("_toks")).cast("long").as("n_tokens"),
        TextAnalysis.alnumRatio(col("_text")).as("alnum_ratio"))

    val filtered = scored.filter(
      col("pred_lang") === cfg.lang &&
        col("n_tokens") >= cfg.minTokens &&
        col("alnum_ratio") >= cfg.minAlnumRatio)

    // exact dedup on the canonical-content digest; min id survives.
    // digest from the already-materialized tokens (no re-tokenize).
    // Shape: row_number over (_h, id) — ONE shuffle on the digest, no
    // keep-ids join (r3 used groupBy-min + semi-join: two shuffles, a
    // join, and a persisted frame that leaked its blocks). The window's
    // own Exchange on _h doubles as the reuse anchor: both consumers of
    // `deduped` (near-dup input, final output) embed the identical
    // subtree, so ReuseExchange / AQE stage reuse scans+scores the
    // corpus ONCE and re-reads shuffle files — zero storage blocks, and
    // at 100 TB scratch-disk shuffle is the right medium anyway. The
    // digest is uniform, so the window partitioning cannot skew.
    // _text is dropped before the shuffle (alnum_ratio is already
    // computed — raw text would double the exchange payload); the
    // isNotNull keeps branch subtrees canonically identical once the
    // near-dup branch infers join-key null filters.
    val withHash = filtered.filter(col(idCol).isNotNull)
      .select(col(idCol), col("_toks"), col("pred_lang"), col("n_tokens"),
        col("alnum_ratio"))
      .withColumn("_h", md5(concat_ws(" ", col("_toks")).cast("binary")))
    val keepFirst = Window.partitionBy(col("_h")).orderBy(col(idCol))
    val deduped = withHash
      .withColumn("_rn", row_number().over(keepFirst))
      .filter(col("_rn") === 1).drop("_rn")

    val survivors = cfg.nearDupJaccard match {
      case None => deduped
      case Some(minJ) =>
        // near-dup over the ALREADY-tokenized column: the scoring scan
        // materialized _toks into the reused exchange, so the LSH stage
        // must not pay the sanitize+tokenize regex a second time.
        val dropIds = Dedup.minHashPairsFromTokens(
            deduped.select(col(idCol), col("_toks")), idCol, "_toks",
            minJaccard = minJ)
          .select(col("b_id").as(idCol)).distinct()
        deduped.join(dropIds, Seq(idCol), "left_anti")
    }
    survivors.select(col(idCol), col("pred_lang"), col("n_tokens"),
      round(col("alnum_ratio"), 4).as("alnum_ratio"))
  }

  /** K-anonymity suppression: keep only rows whose quasi-identifier
    * combination is shared by at least `k` rows — the release gate a
    * training corpus runs so that metadata (language × source ×
    * size-bucket × …) cannot single out an individual document or
    * its author. Returns the input rows plus `group_size`.
    *
    * ONE hash shuffle on the quasi columns (a count window over that
    * partitioning); no join-back — the window carries the group size
    * onto every row in the same pass. Suppression-side note for
    * 100 TB: the filter drops the LONG TAIL (small groups), which is
    * most distinct key combinations but few rows — the surviving
    * heavy groups are exactly the well-partitioned ones. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    df.withColumn("group_size", count(lit(1)).over(w))
      .filter(col("group_size") >= k)
  }
}
