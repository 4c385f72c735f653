package graft.queries

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.functions.BoundedMemo
import graft.operators.Dedup

/** Per-corpus derived tuning constants, memoized per data dir.
  *
  * The d03-family df cap used to be the hand-set `maxDf = 1000` at
  * every call site — a number tuned for one corpus generation that no
  * measurement connected to the corpus at hand (VERDICT r08 #5). It is
  * now [[Dedup.deriveMiningBudget]]'s corpus-stat answer, computed
  * ONCE per data dir (keyed by the documents file's identity, so a
  * regenerated fixture re-derives) and shared by every query that
  * mines near-dup pairs (d03/d07/d11, g01/g02, g06/g07/g08). The
  * derivation job runs inside the first query's build — the same
  * warm-pass slot the other process memos (IVF quantizer, MinHash
  * coefficients) use, so timed benchmark passes see a memo hit, and
  * steady-state query cost is unchanged.
  *
  * At every oracle-checked SF the derived answer is "uncapped"
  * (max df is single digits against a 16-pairs-per-occurrence
  * budget), identical in behavior to the old constant — the static
  * DuckDB oracles keep their `<= 1000` spelling, which is equally a
  * no-op there. The cap ENGAGES where it matters: at scale steps
  * (sf10's cross-shard boilerplate dfs) where a fixed 1000 would sit
  * uselessly above the df distribution and let the join budget go
  * quadratic — exactly the regime the ScaleCheck gate measures.
  *
  * The same derivation also predicts the capped join's OUTPUT volume
  * (Σ min(df,cap)·df candidate pairs), which sizes the pair-join
  * exchange ([[pairPartsFor]]): AQE coalesces that stage by its map
  * output (posting lists) and cannot see the join's fan-out, so at
  * sf10 it ran a ~20 GB partial-agg working set on 37 tasks and
  * spilled 1.9 GB — the planner sizes that one exchange from the cost
  * model instead.
  */
object DerivedCaps {

  /** Memo key for a corpus file: path + mtime + length, so a
    * regenerated fixture under the same path re-derives. */
  private def fileId(s: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, s"$table.parquet")
    try {
      val st = p.getFileSystem(s.sparkContext.hadoopConfiguration).getFileStatus(p)
      s"$dir/$table@${st.getModificationTime}:${st.getLen}"
    } catch { case _: java.io.IOException => s"$dir/$table" }
  }

  private val memo = new BoundedMemo[String, Dedup.MiningBudget](64)

  private def budgetFor(s: SparkSession, dir: String): Dedup.MiningBudget =
    memo.getOrCompute(fileId(s, dir, "documents"),
      _ => Dedup.deriveMiningBudget(Tables.load(s, dir, "documents"), "doc_id", "text"))

  /** The df cap for pair mining over `dir`'s documents table. */
  def maxDfFor(s: SparkSession, dir: String): Int = budgetFor(s, dir).maxDf

  /** Cost-model partition count for the pair join over `dir`'s
    * documents table (see [[Dedup.MiningBudget.pairParts]]).
    * Measurement hook (VERDICT r11 #5): with the session conf
    * `spark.graft.mining.pinPairParts=false` this returns 0, and the
    * mining operators then leave their pair exchanges to AQE — making
    * the pin's local cost A/B-measurable on any consumer (the PLANS.md
    * round-12 attribution). Production never sets the key. */
  def pairPartsFor(s: SparkSession, dir: String): Int =
    if (s.conf.getOption("spark.graft.mining.pinPairParts").contains("false")) 0
    else budgetFor(s, dir).pairParts(s.sparkContext.defaultParallelism)

  /** [[pairPartsFor]] for a query mining a FRACTION of the corpus's
    * candidate volume ([[Dedup.MiningBudget.scaled]]): the g02/g08
    * planted-trio slice passes (3/20)² so the dir-level budget's floor
    * doesn't over-pin a fortieth of the predicted work (measured
    * 1.6–2× wall at sf1, PLANS.md round-14). */
  def pairPartsScaledFor(s: SparkSession, dir: String, fraction: Double): Int =
    if (s.conf.getOption("spark.graft.mining.pinPairParts").contains("false")) 0
    else budgetFor(s, dir).scaled(fraction).pairParts(s.sparkContext.defaultParallelism)

  private val embBitsMemo = new BoundedMemo[String, java.lang.Integer](64)

  /** LSH bucket-key width for near-dup mining over `dir`'s embeddings
    * table ([[graft.operators.Similarity.deriveBits]]): derived from
    * the corpus row count (a parquet-metadata count, memoized per file
    * identity) so expected bucket occupancy — and with it candidate
    * volume per vector — stays constant as the corpus scales. Every
    * oracle-checked SF derives the 12-bit floor, so outputs there are
    * identical to the old fixed family. */
  def embBitsFor(s: SparkSession, dir: String): Int =
    embBitsMemo.getOrCompute(fileId(s, dir, "embeddings"), _ => Int.box(
      graft.operators.Similarity.deriveBits(
        Tables.load(s, dir, "embeddings").count()))).intValue()

  private val embPairsMemo = new BoundedMemo[String, java.lang.Double](64)

  /** Predicted near-dup pair volume for `dir`'s embeddings table
    * ([[graft.operators.Similarity.EmbPairBudget]]): Σ c·(c−1)/2 over
    * identical-vector groups, memoized per file identity — one
    * stats-only aggregation (r15 check: 10,166,000 predicted vs
    * 10,166,020 measured answers at sf40; the +20 are planted). */
  def embPairBudgetFor(s: SparkSession, dir: String): graft.operators.Similarity.EmbPairBudget =
    graft.operators.Similarity.EmbPairBudget(
      embPairsMemo.getOrCompute(fileId(s, dir, "embeddings"), _ => Double.box(
        graft.operators.Similarity.deriveEmbPairBudget(
          Tables.load(s, dir, "embeddings"), "embedding").dupPairs)).doubleValue())

  /** Cost-model partition count for the embedding pair-dedup exchange
    * over `dir`'s embeddings (s03/s11 and d13's internal miner) — 0
    * (leave the aggregate to AQE, the unpinned plan) until the modeled
    * fused-aggregate state outgrows one task's 256 MB share; see
    * [[graft.operators.Similarity.EmbPairBudget.pairParts]]. Honors
    * the same `spark.graft.mining.pinPairParts=false` A/B hook as
    * [[pairPartsFor]] (VERDICT r11 #5). */
  def embPairPartsFor(s: SparkSession, dir: String): Int =
    if (s.conf.getOption("spark.graft.mining.pinPairParts").contains("false")) 0
    else embPairBudgetFor(s, dir).pairParts(s.sparkContext.defaultParallelism)

  /** Cost-model partition count for ConnectedComponents' symmetrized
    * edge dedup when the edges are `dir`'s predicted embedding
    * near-dup answers (d13) — None (AQE sizing) until the modeled
    * distinct state outgrows one task's share; see
    * [[graft.operators.Similarity.EmbPairBudget.symParts]]. Same
    * A/B hook as [[embPairPartsFor]]. */
  def embSymPartsFor(s: SparkSession, dir: String): Option[Int] = {
    val p =
      if (s.conf.getOption("spark.graft.mining.pinPairParts").contains("false")) 0
      else embPairBudgetFor(s, dir).symParts(s.sparkContext.defaultParallelism)
    if (p > 0) Some(p) else None
  }

  private val docCountMemo = new BoundedMemo[String, java.lang.Long](64)

  /** Row count of `dir`'s documents table (parquet-metadata count,
    * memoized per file identity) — gates dimension-vs-fact decisions
    * like [[Dedup.ngramJaccardPairs]]'s sizes-broadcast. */
  def docCountFor(s: SparkSession, dir: String): Long =
    docCountMemo.getOrCompute(fileId(s, dir, "documents"), _ =>
      Long.box(Tables.load(s, dir, "documents").count())).longValue()

  private val tableCountMemo = new BoundedMemo[String, java.lang.Long](64)

  /** Row count of any table in `dir` (parquet-metadata count, memoized
    * per file identity). */
  def tableCountFor(s: SparkSession, dir: String, table: String): Long =
    tableCountMemo.getOrCompute(fileId(s, dir, table), _ =>
      Long.box(Tables.load(s, dir, table).count())).longValue()

  private def clampParts(s: SparkSession, parts: Long): Int =
    math.min(4096L, math.max(s.sparkContext.defaultParallelism.toLong, parts)).toInt

  /** Partition count for an exchange carrying ~one row per `table` row
    * (the r10 sf20 ladder's find, third instance of the d03 pattern):
    * AQE coalesces exchanges by COMPRESSED map-output bytes, but the
    * per-task cost of a sort or (sort-based) aggregation is the
    * IN-MEMORY row state — ~10× the compressed view for slim repetitive
    * rows — so fact-scale sorts/distincts land on ~35 tasks and spill
    * tens of GB (g03's edge distinct: 33.7 GB at sf20). Queries size
    * that one exchange from the memoized row count instead:
    * `rowsPerTask` ≈ 1M keeps per-task state ~tens of MB at any SF. */
  def factPartsFor(s: SparkSession, dir: String, table: String,
                   rowsPerTask: Long = 1000000L): Int =
    clampParts(s, (tableCountFor(s, dir, table) + rowsPerTask - 1) / rowsPerTask)

  private val gramPartsMemo = new BoundedMemo[String, java.lang.Integer](64)

  /** Partition count for a token-n-gram-scale exchange over `dir`'s
    * documents (d12's span mining): gram rows ≈ total text chars / ~6
    * (one gram per token position), far beyond any row count a table
    * metadata read can see, so the estimate comes from Σ n_chars — one
    * memoized single-column aggregation. ~500k fixed-width fingerprint
    * rows per task keeps the post-exchange sort-based aggregation's
    * state comfortably in memory at any SF (the r10 sf20 ladder
    * measured 1.5M STRING-keyed rows per task spilling 545 MB each —
    * string sort state expands ~10x the compressed exchange view,
    * which drove the switch to xxhash64 group keys in
    * [[graft.operators.Dedup.repeatedSpans]]). */
  def gramPartsFor(s: SparkSession, dir: String): Int =
    gramPartsMemo.getOrCompute(fileId(s, dir, "documents"), _ => {
      import org.apache.spark.sql.functions._
      val chars = Tables.load(s, dir, "documents")
        .agg(sum(col("n_chars"))).collect()(0)
      val grams = (if (chars.isNullAt(0)) 0L else chars.getLong(0)) / 6L
      Int.box(clampParts(s, (grams + 499999L) / 500000L))
    }).intValue()

  private val gridPartsMemo = new BoundedMemo[String, java.lang.Integer](64)

  /** Partition count for a gap-fill output-grid sort over `dir`'s view
    * events at `stepUs` (the r10 postcap ladder's find): the final
    * range exchange's map output is the full grid, highly repetitive →
    * ~10× compression, so AQE's byte-based coalescer packs ~10× more
    * in-memory sort state per task than it can see and the sort spills
    * (measured 2.6 GB at sf20 on 35 AQE-chosen tasks). The grid size
    * is EXACT from per-key sample bounds — Σ_key (floor(hi/step) −
    * ceil(lo/step) + 1)⁺ — one aggregation over the events table,
    * memoized per file identity; the query pins the sort exchange at
    * ~1M grid rows per task (REPARTITION_BY_NUM, which AQE's coalescer
    * skips). Same planner-sizes-what-AQE-cannot-see move as
    * [[pairPartsFor]]. */
  def gapFillGridPartsFor(s: SparkSession, dir: String, stepUs: Long): Int =
    gridPartsMemo.getOrCompute(fileId(s, dir, "events") + s"#step=$stepUs", _ => {
      import org.apache.spark.sql.functions._
      val rows = Tables.load(s, dir, "events")
        .filter(col("event_type") === "view")
        .select(col("user_id"), expr("ts div 1000").as("tus"))
        .groupBy(col("user_id"))
        .agg(min(col("tus")).as("lo"), max(col("tus")).as("hi"))
        .select(sum(greatest(lit(0L),
          expr(s"hi div $stepUs") - expr(s"(lo + ${stepUs - 1}) div $stepUs") + 1))
          .as("n"))
        .collect()(0)
      val grid = if (rows.isNullAt(0)) 0L else rows.getLong(0)
      val byRows = math.ceil(grid / 1000000.0).toInt
      Int.box(math.min(4096, math.max(s.sparkContext.defaultParallelism, byRows)))
    }).intValue()

  private val qualityBoundsMemo =
    new BoundedMemo[String, Array[(String, Long, Long, Long)]](64)

  /** Per-language LM-fluency decile boundaries for `dir`'s documents
    * table ([[graft.operators.TextAnalysis.decileBounds]]), memoized
    * per file identity as collected rows (≤ 10 per language — corpus
    * STATS, never corpus rows) and rebuilt as a local relation. The
    * boundary table is a per-corpus artifact exactly like the mining
    * budget and the IVF quantizer: refitting it on every invocation
    * re-runs the histogram + window subtree for an answer that cannot
    * change (the r9 bench measured that refit as t24's 1.9× min-to-med
    * spread at sf1). */
  def qualityBoundsFor(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val rows = qualityBoundsMemo.getOrCompute(fileId(s, dir, "documents"), _ =>
      graft.operators.TextAnalysis.decileBounds(
          graft.operators.TextAnalysis.lmScored(
            Tables.load(s, dir, "documents"), "doc_id", "text", "lang"), "lang")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    import s.implicits._
    rows.toSeq.toDF("lang", "decile", "lo_ppm", "hi_ppm")
  }
}
