package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Audit, BloomJoin, Clustering, Decontaminate, Dedup, History, Mixing}

/** Corpus-composition queries (`x` group): the operators that turn a
  * deduplicated document pool into a training mix — benchmark
  * decontamination, deterministic (stratified) sampling, source
  * mixing to target counts, token-budget sequence packing, and
  * Bloom-pruned novelty filtering for incremental ingest.
  *
  * Everything here is content-addressed (md5 coins, digest keys), so
  * every query carries a full DuckDB oracle: the sample/mix/pack
  * decisions are bit-reproducible in any engine with md5 — that
  * determinism is a FEATURE of the operators (resumable, auditable
  * pipelines), not a test convenience.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val SqlToks =
    """list_filter(string_split_regex(lower(regexp_replace(text, '([^\s\w]|_)+', ' ', 'g')), '\s+'), x -> x <> '')"""

  private val SqlNorm =
    """array_to_string(list_filter(string_split_regex(lower(regexp_replace(text, '([^\s\w]|_)+', ' ', 'g')), '\s+'), x -> x <> ''), ' ')"""

  /** DuckDB twin of the deterministic md5 coin in [[Mixing]]. */
  private def sqlCoin(keyExpr: String, salt: String): String =
    s"substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 8)"

  // The benchmark slice for x01: every 40th doc starting at 7. The
  // PLANTED leaks (benchmark docs re-inserted as corpus members at
  // doc_id + Planted.Off2) make full containment rows deterministic, same
  // convention as d04/d05's planted duplicates.
  private val BenchPred = "doc_id % 40 = 7"

  /** x15/x18's shared fixture: four corpus versions with deterministic
    * revisions ((id+u) % 5 bumps the digest) and deletions
    * ((id+v) % 13 drops the doc from snapshot v). */
  private def versionSnaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    (1 to 4).map { v =>
      val rev = (2 to v).map(u =>
        when(($"doc_id" + u) % 5 === 0, 1L).otherwise(0L))
        .foldLeft(lit(0L))(_ + _)
      d.filter(($"doc_id" + v) % 13 =!= 0)
        .select(lit(v.toLong).as("version"), $"doc_id",
          substring(md5(concat($"text", lit(" rev"), rev)), 1, 12).as("digest"))
    }.reduce(_ unionByName _)
  }

  /** The four probe versions as a 4-row frame (broadcast by size). */
  private def spark_range_versions(s: SparkSession): DataFrame = {
    import s.implicits._
    (1L to 4L).toDF("q_version")
  }

  /** Shared oracle for the x20 batch merge and its x21 streaming
    * twin: one window over the unioned snapshot + changelog instead
    * of the max_by aggregate; identical survivor set either way. */
  private val ChangelogSql =
    """WITH u3 AS (SELECT unnest(range(1, 4)) AS u),
      |snap AS (
      |  SELECT doc_id, substr(md5(text || ' rev0'), 1, 12) AS digest,
      |         0 AS seq, 'U' AS op
      |  FROM documents WHERE doc_id % 4 <> 3),
      |ups AS (
      |  SELECT d.doc_id,
      |         substr(md5(d.text || ' rev' || CAST(u.u AS VARCHAR)), 1, 12) AS digest,
      |         2 * u.u - 1 AS seq, 'U' AS op
      |  FROM documents d CROSS JOIN u3 u WHERE (d.doc_id + u.u) % 7 = 0),
      |dels AS (
      |  SELECT d.doc_id, CAST(NULL AS VARCHAR) AS digest,
      |         2 * u.u AS seq, 'D' AS op
      |  FROM documents d CROSS JOIN u3 u WHERE (d.doc_id + 3 * u.u) % 11 = 0),
      |allr AS (
      |  SELECT * FROM snap UNION ALL SELECT * FROM ups
      |  UNION ALL SELECT * FROM dels),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn,
      |         max(seq) OVER (PARTITION BY doc_id) AS mx
      |  FROM allr)
      |SELECT doc_id, digest, CAST(mx AS BIGINT) AS last_seq
      |FROM r WHERE rn = 1 AND op <> 'D'
      |ORDER BY doc_id""".stripMargin

  // x02 stratified sampling rates / x03 source quotas — exercised over
  // the corpus's real strata (5 langs, 20 sources).
  private val Rates = Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.125)
  private val Quotas = Map("src0" -> 10L, "src3" -> 5L, "src7" -> 17L, "src12" -> 25L)
  private val TokenBudgets = Map("src1" -> 400L, "src5" -> 900L, "src9" -> 150L)
  private val HoldoutSplits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Benchmark decontamination: trigram containment of each corpus
    // doc in the pooled benchmark shingle set; report every doc that
    // shares at least one shingle. Plants exact leaks of all
    // benchmark docs → those rows surface at overlap = 1.0.
    "x01_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val bench = d.filter(expr(BenchPred))
      val corpus = d.filter(!expr(BenchPred))
        .unionByName(bench.withColumn("doc_id", $"doc_id" + Planted.Off2))
      Decontaminate.overlapScores(corpus, bench.select($"text"), "doc_id", "text", n = 3)
        .filter($"n_hit" > 0)
        .select($"doc_id", $"n_hit", $"n_sh", round($"overlap", 4).as("overlap"))
        .orderBy($"doc_id")
    }),

    // Stratified deterministic sample by language: one codegen'd
    // map-side filter, no shuffle (the ORDER BY here is only for the
    // oracle compare).
    "x02_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      Mixing.sampleStratified(docs(s, dir), "doc_id", "lang", Rates,
          defaultRate = 0.0, salt = "s42")
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    }),

    // Quality-weighted sampling: per-row acceptance rate proportional
    // to document length (capped at 1) — long docs survive with
    // certainty, short ones proportionally. Map-side codegen filter,
    // zero shuffle; coin-vs-rate compare is exact double arithmetic
    // so the oracle is bit-identical.
    // K-anonymity release gate: a doc survives only when ≥5 docs
    // share its (lang, source, size-bucket) quasi-identifier combo —
    // the privacy pass a corpus release runs so metadata can't single
    // out one document/author. One hash shuffle (count window over
    // the quasi partitioning, group size carried in the same pass, no
    // join-back); the suppressed long tail is most KEY combos but few
    // ROWS, so the filter is cheap and the survivors well-partitioned.
    "x17_k_anonymity" -> ((s, dir) => {
      import s.implicits._
      val q = docs(s, dir).select($"doc_id", $"lang", $"source",
        expr("n_chars div 256").as("len_bucket"))
      graft.operators.Curation.kAnonymize(q, Seq("lang", "source", "len_bucket"), k = 5L)
        .orderBy($"doc_id")
    }),

    "x13_sample_weighted" -> ((s, dir) => {
      import s.implicits._
      Mixing.sampleWeighted(docs(s, dir), "doc_id",
          least(lit(1.0), $"n_chars" / lit(400.0)), salt = "w42")
        .select($"doc_id", $"n_chars")
        .orderBy($"doc_id")
    }),

    // The dataset card: the per-source datasheet a corpus release
    // ships with — volume, token budget, language spread, exact-dup
    // rate — in ONE scan. Every metric is integer-derived (counts and
    // integer sums; the two ratios are a single division of exact
    // integers), so float summation order cannot perturb the result
    // and the card carries a full cross-engine oracle.
    "x14_dataset_card" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, dir).select($"source", $"lang",
        size(graft.functions.TextFunctions.tokenize($"text")).cast("long").as("n_tok"),
        Dedup.contentHash($"text").as("h"))
      val withDup = base.withColumn("grp",
        count(lit(1)).over(Window.partitionBy($"h")))
      withDup.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("total_tokens"),
          round(sum($"n_tok") / count(lit(1)).cast("double"), 4).as("avg_tokens"),
          countDistinct($"lang").as("n_langs"),
          sum(($"grp" > 1).cast("long")).as("n_dup_docs"),
          round(sum(($"grp" > 1).cast("long")) / count(lit(1)).cast("double"), 4)
            .as("dup_ratio"))
        .orderBy($"source")
    }),

    // Source mixing: down-sample each source to its target count by
    // deterministic-coin rank; unlisted sources drop to zero.
    "x03_mix_sources" -> ((s, dir) => {
      import s.implicits._
      Mixing.mixSources(docs(s, dir), "doc_id", "source", Quotas,
          defaultQuota = 0L, salt = "m42")
        .select($"doc_id", $"source", $"_rank".as("rnk"))
        .orderBy($"doc_id")
    }),

    // Sequence packing: per-source doc_id-ordered token cumsum into
    // 512-token context windows; each doc reports its pack index and
    // starting offset.
    "x04_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      val withToks = docs(s, dir)
        .select($"doc_id", $"source",
          graft.operators.TextAnalysis.tokenCount($"text").as("n_tok"))
      Mixing.packSequences(withToks, "source", "doc_id", "n_tok", budget = 512L)
        .select($"doc_id", $"source", $"n_tok", $"pack", $"pack_offset")
        .orderBy($"doc_id")
    }),

    // Deterministic corpus shuffle: reproducible training order via
    // the md5 coin, positions materialized WITHOUT a global
    // single-partition window (256 coin-prefix buckets enumerate in
    // parallel; a broadcast 256-row offset table stitches them).
    "x06_shuffle_order" -> ((s, dir) => {
      import s.implicits._
      Mixing.enumerateShuffled(docs(s, dir), "doc_id", salt = "o42")
        .select($"doc_id", $"pos")
        .orderBy($"pos")
    }),

    // Leakage-safe holdout split: the coin is thrown on SOURCE, so a
    // source's documents (and the near-dups that cluster inside it)
    // never straddle the train/eval boundary.
    "x07_holdout_split" -> ((s, dir) => {
      import s.implicits._
      Mixing.assignSplits(docs(s, dir), "source", HoldoutSplits, salt = "h42")
        .select($"doc_id", $"source", $"split")
        .orderBy($"doc_id")
    }),

    // Cross-source overlap matrix: distinct shared trigrams and
    // small-side containment per source pair — the corpus-level
    // mirror/subset diagnostic upstream of doc-level dedup. The one
    // wide exchange (hash on shingle: distinct-pair dedup + self-join
    // ride it together) is sized from the corpus token count — the
    // shingle frame is vocabulary-scale, which the session's fixed
    // shuffle parallelism cannot track (at 32 partitions the sf80
    // rung sorted ~5M string rows per task: 448 MB state, 19.6 GB
    // spill; same corpus under the derived count: zero spill).
    "x08_source_overlap" -> ((s, dir) => {
      import s.implicits._
      Decontaminate.sourceOverlap(docs(s, dir), "source", "text", n = 3,
          parts = DerivedCaps.gramPartsFor(s, dir))
        .select($"source_a", $"source_b", $"n_shared",
          round($"containment", 4).as("containment"))
        .orderBy($"source_a", $"source_b")
    }),

    // Context-window chunking: 32-token windows at stride 24 (8-token
    // overlap) — pure map-side explode, zero shuffles; the complement
    // of x04's packing.
    "x09_chunk_windows" -> ((s, dir) => {
      import s.implicits._
      Mixing.chunkTokens(docs(s, dir), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .orderBy($"doc_id", $"chunk_id")
    }),

    // Snapshot diff between two corpus versions: v1 drops doc_id%5=4,
    // v2 drops doc_id%11=3 and rewrites every doc_id%7=0 — the diff
    // classifies each surviving id by content digest, so only
    // added/changed rows would re-enter the pipeline.
    "x10_snapshot_diff" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val v1 = d.filter($"doc_id" % 5 =!= 4)
      val v2 = d.filter($"doc_id" % 11 =!= 3)
        .withColumn("text",
          when($"doc_id" % 7 === 0, concat($"text", lit(" version two")))
            .otherwise($"text"))
      Dedup.snapshotDiff(v1, v2, "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Z-order layout key over (user_id, hour): the Morton interleave
    // that clusters a corpus so parquet min/max prunes on BOTH
    // columns. Pure integer bit arithmetic — the oracle SQL is
    // generated from the same loop as the Spark expression.
    "x12_zorder_key" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .withColumn("hour", expr("(ts div 1000) div 3600000000"))
      ev.select($"event_id",
          graft.operators.Layout.zValue(Seq($"user_id", $"hour"), bits = 16)
            .as("zkey"))
        .orderBy($"event_id")
    }),

    // Zone-map skip audit: build min/max-per-block statistics (the
    // thing parquet row-group pruning reads) under TWO layouts of the
    // same events — arrival order (event_id blocks) vs Z-order
    // ((user_id, hour) Morton-prefix blocks) — and measure how many
    // blocks a user-band predicate can skip in each. The Z-order
    // blocks cover small (user, hour) boxes, so their user ranges are
    // narrow and almost all of them prune; arrival-order blocks span
    // every user and prune nothing. Both zone ids are pure map-side
    // arithmetic (no global sort, no row_number): at 100 TB the zone
    // id IS the file the row lands in, and each zone map build is one
    // zone-count-sized aggregate.
    "x24_skip_stats" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id",
          expr("(ts div 1000) div 3600000000").as("hour"))
      val natural = graft.operators.Layout.zoneMap(
        e.withColumn("zone", expr("event_id div 256")), "zone", Seq("user_id"))
      val zord = graft.operators.Layout.zoneMap(
        e.withColumn("zone", shiftright(
          graft.operators.Layout.zValue(Seq($"user_id", $"hour"), bits = 16), 8)),
        "zone", Seq("user_id"))
      def audit(zm: DataFrame, label: String): DataFrame = {
        val prunable = $"max_user_id" < 10L || $"min_user_id" > 19L
        zm.agg(count(lit(1)).as("n_zones"),
            sum(when(prunable, 1L).otherwise(0L)).as("n_prunable"),
            sum($"n_rows").as("rows_total"),
            sum(when(prunable, $"n_rows").otherwise(0L)).as("rows_skipped"))
          .select(lit(label).as("layout"), $"n_zones", $"n_prunable",
            $"rows_total", $"rows_skipped")
      }
      audit(natural, "natural").unionByName(audit(zord, "zorder"))
        .orderBy($"layout")
    }),

    // Curriculum ordering: global training position that walks
    // difficulty levels (length buckets) in order and shuffles
    // content-addressably within each level. No single-partition
    // window anywhere: ranks run per (level, coin-prefix) shard and a
    // broadcast offset table stitches them into the global position —
    // bit-identical to the naive global row_number the oracle runs.
    "x25_curriculum" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).withColumn("level", expr("n_chars div 200"))
      Mixing.curriculumOrder(d, "doc_id", "level", salt = "cur42")
        .select($"doc_id", $"level", $"pos")
        .orderBy($"doc_id")
    }),

    // Resharding audit under rendezvous hashing: every doc's shard at
    // n=16 and n=17, plus whether growing the fleet moves it. The
    // deterministic content-addressed assignment is what makes
    // incremental resharding auditable: ~1/17 of docs move, the rest
    // provably stay — map-side codegen, zero shuffle (the ORDER BY is
    // the oracle-compare convention).
    "x26_reshard_audit" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id",
          Mixing.rendezvousShard($"doc_id", 16, "rv42").as("shard16"),
          Mixing.rendezvousShard($"doc_id", 17, "rv42").as("shard17"))
        .withColumn("moved", ($"shard16" =!= $"shard17").cast("long"))
        .orderBy($"doc_id")
    }),

    // Temperature-flattened mixing: per-source quota = 3·⌊√n_source⌋
    // (α=0.5 reweighting) computed from the data in the same window
    // shuffle that ranks the coins — no driver action, no config.
    "x11_temperature_mix" -> ((s, dir) => {
      import s.implicits._
      Mixing.mixTemperature(docs(s, dir), "doc_id", "source",
          perSqrt = 3L, salt = "tm42")
        .select($"doc_id", $"source", $"_rank".as("rnk"), $"_quota".as("quota"))
        .orderBy($"doc_id")
    }),

    // Cluster-balanced sampling: s07's deterministic k-means
    // membership feeds the md5-coin quota sampler — 25 vectors per
    // cluster, ranked by content-addressed coin. The diversity-
    // preserving downsample a curation pipeline runs instead of a
    // uniform one (uniform sampling keeps the modes, starves the
    // tails); end-to-end deterministic because BOTH stages are, so
    // the composition sits under one exact oracle.
    "x16_cluster_sample" -> ((s, dir) => {
      import s.implicits._
      val assign = Clustering.kmeansInt(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, cacheKey = Some(s"$dir#full8"))
      Mixing.mixSources(assign.withColumn("cl", $"cluster".cast("string")),
          "vec_id", "cl",
          quotas = (0 to 7).map(i => i.toString -> 25L).toMap, salt = "cb7")
        .select($"vec_id", $"cluster", $"_rank".as("rnk"))
        .orderBy($"vec_id")
    }),

    // SCD2 corpus history: four synthetic corpus versions (presence
    // varies by (doc_id+v) % 13, content revs at versions where
    // (doc_id+v) % 5 = 0) collapse into validity intervals — maximal
    // runs of consecutive versions with unchanged content digest,
    // absence gaps ending a run. The lineage record an incremental
    // re-crawl pipeline keeps instead of four full corpus copies.
    "x15_scd2_history" -> ((s, dir) => {
      import s.implicits._
      History.scd2(versionSnaps(s, dir), "doc_id", "version", "digest")
        .withColumn("is_current", ($"v_to" === 4).cast("long"))
        .orderBy($"doc_id", $"v_from")
    }),

    // Point-in-time-correct lookup against the SCD2 history — the
    // feature-store probe: "what was this entity's state AT version
    // v", never leaking future revisions into training features.
    // History.pitLookup documents the scale shape; deleted-at-that-
    // version probes surface as is_live = 0 instead of vanishing.
    "x18_pit_lookup" -> ((s, dir) => {
      import s.implicits._
      val hist = History.scd2(versionSnaps(s, dir), "doc_id", "version", "digest")
      val probes = docs(s, dir).select($"doc_id")
        .crossJoin(spark_range_versions(s))
      History.pitLookup(hist, probes, "doc_id", "q_version")
        .select($"doc_id", $"q_version", $"digest",
          $"digest".isNotNull.cast("long").as("is_live"))
        .orderBy($"doc_id", $"q_version")
    }),

    // Data-quality release gate: hard constraints (domain / range /
    // uniqueness / referential integrity — all must hold at 0) plus
    // quality screens (short docs, zero-discount lines — expected
    // nonzero). Every per-table rule family folds into ONE aggregate
    // pass over its scan; RI checks are one hashed join each against
    // the distinct parent keys.
    "x19_dq_audit" -> ((s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
      val lineitem = Tables.load(s, dir, "lineitem")
      val d = docs(s, dir)
      Seq(
        Audit.ruleAudit(orders, "orders", Seq(
          "totalprice_pos" -> !($"o_totalprice" > 0),
          "status_domain" -> !$"o_orderstatus".isin("O", "F", "P"),
          "orderdate_notnull" -> $"o_orderdate".isNull)),
        Audit.uniqueness(orders, "orders", "o_orderkey"),
        Audit.orphanCount(orders, "orders", "o_custkey",
          customer, "c_custkey"),
        Audit.ruleAudit(lineitem, "lineitem", Seq(
          "quantity_range" -> !($"l_quantity" >= 1 && $"l_quantity" <= 50),
          "discount_range" -> !($"l_discount" >= 0 && $"l_discount" <= 0.1),
          "screen_zero_discount" -> ($"l_discount" === 0))),
        Audit.orphanCount(lineitem, "lineitem", "l_orderkey",
          orders, "o_orderkey"),
        Audit.ruleAudit(d, "documents", Seq(
          "chars_consistent" -> ($"n_chars" =!= length($"text")),
          "lang_domain" -> !$"lang".isin("en", "de", "es", "fr", "zh"),
          "screen_short_doc" -> ($"n_chars" < 200))))
        .reduce(_ unionByName _)
        .orderBy($"tbl", $"check")
    }),

    // Latest-wins CDC merge: the corpus snapshot (doc_id % 4 <> 3)
    // plus an interleaved changelog — three rounds of upserts (seq
    // 1,3,5, digest revised per round) and deletes (seq 2,4,6) —
    // collapsed by History.applyChangelog in one key-hashed shuffle
    // with map-side max_by partials. Keys whose final op is a delete
    // drop out; re-inserts after a delete survive.
    "x20_apply_changelog" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val snap = d.filter($"doc_id" % 4 =!= 3)
        .select($"doc_id",
          substring(md5(concat($"text", lit(" rev0"))), 1, 12).as("digest"))
      val log = (1 to 3).map { u =>
        val up = d.filter(($"doc_id" + u) % 7 === 0)
          .select($"doc_id",
            substring(md5(concat($"text", lit(s" rev$u"))), 1, 12).as("digest"),
            lit(2L * u - 1).as("seq"), lit("U").as("op"))
        val del = d.filter(($"doc_id" + 3 * u) % 11 === 0)
          .select($"doc_id", lit(null).cast("string").as("digest"),
            lit(2L * u).as("seq"), lit("D").as("op"))
        up.unionByName(del)
      }.reduce(_ unionByName _)
      History.applyChangelog(snap, log, "doc_id", "seq", "op")
        .orderBy($"doc_id")
    }),

    // Token-budget mixing: the mix spec in TOKENS ("budget B of
    // src0"), filled greedily in deterministic coin order within each
    // source — the strict-prefix contract (cumsum ≤ budget) keeps it
    // resumable and oracle-exact. One window shuffle on the source;
    // rank and running total ride the same sort.
    "x23_token_budget" -> ((s, dir) => {
      import s.implicits._
      val withToks = docs(s, dir)
        .select($"doc_id", $"source",
          graft.operators.TextAnalysis.tokenCount($"text").as("n_tok"))
      Mixing.mixTokenBudget(withToks, "doc_id", "source", "n_tok",
          TokenBudgets, defaultBudget = 0L, salt = "tb42")
        .select($"doc_id", $"source", $"n_tok",
          $"_rank".as("rnk"), $"_cum_tokens".as("cum_tok"))
        .orderBy($"doc_id")
    }),

    // Incremental view maintenance: the per-source (count, chars)
    // summary carried across the changelog by DELTAS — the log
    // collapses in one log-sized shuffle, changed keys prune the
    // snapshot via the equi-join, and the group-sized delta merges
    // into the standing view. The oracle recomputes the post-change
    // state from scratch: incremental and full recompute must agree
    // exactly. Upserts here also grow the doc (n_chars + round) so
    // value deltas, not just membership, are exercised.
    "x22_incremental_agg" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val snap = d.filter($"doc_id" % 4 =!= 3)
        .select($"doc_id", $"source", $"n_chars")
      val log = (1 to 3).map { u =>
        val up = d.filter(($"doc_id" + u) % 7 === 0)
          .select($"doc_id", $"source", ($"n_chars" + u).as("n_chars"),
            lit(2L * u - 1).as("seq"), lit("U").as("op"))
        val del = d.filter(($"doc_id" + 3 * u) % 11 === 0)
          .select($"doc_id", lit(null).cast("string").as("source"),
            lit(null).cast("long").as("n_chars"),
            lit(2L * u).as("seq"), lit("D").as("op"))
        up.unionByName(del)
      }.reduce(_ unionByName _)
      History.incrementalAgg(snap, log, "doc_id", "source", "n_chars",
          "seq", "op")
        .select($"source", $"n_rows".as("n_docs"),
          $"sum_val".as("sum_chars"))
        .orderBy($"source")
    }),

    // STREAMING twin of x20: the same snapshot + changelog arrive as
    // a stream; per-key state holds only the highest-sequence record
    // and flushes once the watermark passes — the materialized-view
    // maintenance path. Same oracle as x20: the merged tables must be
    // identical however the changelog is consumed.
    "x21_stream_upsert" -> ((s, dir) =>
      graft.streaming.StreamingJobs.upsertAvailableNow(s, dir)),

    // Bloom-pruned novelty: incoming = the whole corpus, seen = the
    // content digests of docs with doc_id % 3 <> 0; exact novel set
    // out. The bloom prunes the definitely-novel majority before the
    // residual anti-join.
    "x05_bloom_novel" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val incoming = d.select($"doc_id", Dedup.contentHash($"text").as("h"))
      val seen = d.filter($"doc_id" % 3 =!= 0)
        .select(Dedup.contentHash($"text").as("h"))
      BloomJoin.bloomAntiJoin(incoming, seen, "h",
          expectedItems = 100000L, fpp = 0.01)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),
  )

  val oracles: Map[String, String] = Map(

    "x01_decontaminate" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE NOT ($BenchPred)
         |  UNION ALL
         |  SELECT doc_id + 2000000000000, text FROM documents WHERE $BenchPred),
         |ctoks AS (SELECT doc_id, $SqlToks AS t FROM corpus),
         |csh AS (
         |  SELECT DISTINCT doc_id, shingle FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |    FROM ctoks)),
         |btoks AS (SELECT $SqlToks AS t FROM documents WHERE $BenchPred),
         |bsh AS (
         |  SELECT DISTINCT shingle FROM (
         |    SELECT unnest(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |    FROM btoks)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY doc_id),
         |hits AS (SELECT doc_id, count(*) AS n_hit
         |         FROM csh JOIN bsh USING (shingle) GROUP BY doc_id)
         |SELECT s.doc_id, h.n_hit, s.n_sh,
         |       round(CAST(h.n_hit AS DOUBLE) / s.n_sh, 4) AS overlap
         |FROM sizes s JOIN hits h ON h.doc_id = s.doc_id
         |WHERE h.n_hit > 0
         |ORDER BY s.doc_id""".stripMargin,

    "x02_sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         |JOIN (VALUES ${Rates.toSeq.sorted.map { case (k, r) =>
              s"('$k', '${Mixing.rateThreshold(r)}')" }.mkString(", ")})
         |  t(l, th) ON l = lang
         |WHERE ${sqlCoin("doc_id", "s42")} < th
         |ORDER BY doc_id""".stripMargin,

    // x15's CTE chain + the probe join, BETWEEN on validity
    "x18_pit_lookup" ->
      """WITH vers AS (SELECT unnest(range(1, 5)) AS version),
        |snaps AS (
        |  SELECT v.version, d.doc_id,
        |    substr(md5(d.text || ' rev' || CAST(
        |      coalesce(list_sum(list_transform(range(2, v.version + 1),
        |        u -> CASE WHEN (d.doc_id + u) % 5 = 0 THEN 1 ELSE 0 END)), 0)
        |      AS VARCHAR)), 1, 12) AS digest
        |  FROM documents d CROSS JOIN vers v
        |  WHERE (d.doc_id + v.version) % 13 <> 0),
        |flagged AS (
        |  SELECT doc_id, version, digest,
        |    CASE WHEN lag(digest) OVER w IS NULL OR lag(digest) OVER w <> digest
        |           OR lag(version) OVER w <> version - 1 THEN 1 ELSE 0 END AS new_run
        |  FROM snaps WINDOW w AS (PARTITION BY doc_id ORDER BY version)),
        |runs AS (
        |  SELECT doc_id, version, digest,
        |    sum(new_run) OVER (PARTITION BY doc_id ORDER BY version) AS run
        |  FROM flagged),
        |hist AS (
        |  SELECT doc_id, min(version) AS v_from, max(version) AS v_to,
        |    min(digest) AS digest
        |  FROM runs GROUP BY doc_id, run),
        |probes AS (SELECT d.doc_id, v.version AS q_version
        |           FROM documents d CROSS JOIN vers v)
        |SELECT p.doc_id, CAST(p.q_version AS BIGINT) AS q_version, h.digest,
        |  CAST(CASE WHEN h.digest IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_live
        |FROM probes p LEFT JOIN hist h
        |  ON h.doc_id = p.doc_id AND p.q_version BETWEEN h.v_from AND h.v_to
        |ORDER BY p.doc_id, p.q_version""".stripMargin,

    // every rule spelled as coalesce(<violation>, TRUE) so NULLs
    // count as violations on both engines
    "x19_dq_audit" ->
      """SELECT * FROM (
        |SELECT 'orders' AS tbl, v.chk AS "check",
        |  (SELECT count(*) FROM orders) AS n_checked, v.n AS n_violations
        |FROM (VALUES
        |  ('totalprice_pos', (SELECT CAST(sum(CASE WHEN coalesce(NOT (o_totalprice > 0), TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders)),
        |  ('status_domain', (SELECT CAST(sum(CASE WHEN coalesce(o_orderstatus NOT IN ('O','F','P'), TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders)),
        |  ('orderdate_notnull', (SELECT CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders)),
        |  ('unique_o_orderkey', (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders)),
        |  ('fk_o_custkey_to_c_custkey', (SELECT CAST(count(*) AS BIGINT) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL))
        |) AS v(chk, n)
        |UNION ALL
        |SELECT 'lineitem', v.chk,
        |  (SELECT count(*) FROM lineitem), v.n
        |FROM (VALUES
        |  ('quantity_range', (SELECT CAST(sum(CASE WHEN coalesce(NOT (l_quantity >= 1 AND l_quantity <= 50), TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)),
        |  ('discount_range', (SELECT CAST(sum(CASE WHEN coalesce(NOT (l_discount >= 0 AND l_discount <= 0.1), TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)),
        |  ('screen_zero_discount', (SELECT CAST(sum(CASE WHEN coalesce(l_discount = 0, TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)),
        |  ('fk_l_orderkey_to_o_orderkey', (SELECT CAST(count(*) AS BIGINT) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL))
        |) AS v(chk, n)
        |UNION ALL
        |SELECT 'documents', v.chk,
        |  (SELECT count(*) FROM documents), v.n
        |FROM (VALUES
        |  ('chars_consistent', (SELECT CAST(sum(CASE WHEN coalesce(n_chars <> length(text), TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM documents)),
        |  ('lang_domain', (SELECT CAST(sum(CASE WHEN coalesce(lang NOT IN ('en','de','es','fr','zh'), TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM documents)),
        |  ('screen_short_doc', (SELECT CAST(sum(CASE WHEN coalesce(n_chars < 200, TRUE) THEN 1 ELSE 0 END) AS BIGINT) FROM documents))
        |) AS v(chk, n)
        |) ORDER BY tbl, "check"""".stripMargin,

    // independent spelling: one window over the unioned log instead
    // of the max_by aggregate; identical survivor set
    "x20_apply_changelog" -> ChangelogSql,

    // the stream must converge to the SAME merged table as the batch
    // merge — one oracle gates both consumption paths
    "x21_stream_upsert" -> ChangelogSql,

    // FULL RECOMPUTE of the post-change state: latest-wins collapse
    // of snapshot (chars payload) + changelog, then the aggregate —
    // the incremental delta path must land on exactly this
    "x22_incremental_agg" ->
      """WITH u3 AS (SELECT unnest(range(1, 4)) AS u),
        |base AS (
        |  SELECT doc_id, source, n_chars, 0 AS seq, 'U' AS op
        |  FROM documents WHERE doc_id % 4 <> 3),
        |ups AS (
        |  SELECT d.doc_id, d.source, d.n_chars + u.u AS n_chars,
        |         2 * u.u - 1 AS seq, 'U' AS op
        |  FROM documents d CROSS JOIN u3 u WHERE (d.doc_id + u.u) % 7 = 0),
        |dels AS (
        |  SELECT d.doc_id, CAST(NULL AS VARCHAR) AS source,
        |         CAST(NULL AS BIGINT) AS n_chars, 2 * u.u AS seq, 'D' AS op
        |  FROM documents d CROSS JOIN u3 u WHERE (d.doc_id + 3 * u.u) % 11 = 0),
        |allr AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM ups
        |  UNION ALL SELECT * FROM dels),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
        |  FROM allr),
        |final AS (SELECT doc_id, source, n_chars FROM r WHERE rn = 1 AND op <> 'D')
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM final GROUP BY source ORDER BY source""".stripMargin,

    // independent spelling: explicit group-by + join-back instead of
    // the window; identical survivor set and group sizes
    "x17_k_anonymity" ->
      """WITH q AS (SELECT doc_id, lang, source, n_chars // 256 AS len_bucket
        |           FROM documents),
        |g AS (SELECT lang, source, len_bucket, count(*) AS group_size
        |      FROM q GROUP BY lang, source, len_bucket)
        |SELECT q.doc_id, q.lang, q.source,
        |  CAST(q.len_bucket AS BIGINT) AS len_bucket,
        |  CAST(g.group_size AS BIGINT) AS group_size
        |FROM q JOIN g USING (lang, source, len_bucket)
        |WHERE g.group_size >= 5 ORDER BY doc_id""".stripMargin,

    // integer counts/sums + one division each for the two ratios —
    // identical association both sides
    "x14_dataset_card" ->
      s"""WITH base AS (
         |  SELECT source, lang, CAST(len($SqlToks) AS BIGINT) AS n_tok,
         |         md5($SqlNorm) AS h
         |  FROM documents),
         |wd AS (SELECT *, count(*) OVER (PARTITION BY h) AS grp FROM base)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  round(CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS avg_tokens,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(sum(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |  round(CAST(sum(CASE WHEN grp > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
         |FROM wd GROUP BY source ORDER BY source""".stripMargin,

    // the coin's 8 hex chars convert to an exact-in-double integer;
    // < rate*2^32 is one correctly-rounded multiply + an exact compare
    "x13_sample_weighted" ->
      s"""SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM documents
         |WHERE CAST(concat('0x', ${sqlCoin("doc_id", "w42")}) AS BIGINT)
         |  < least(1.0e0, n_chars / 400.0e0) * 4294967296.0e0
         |ORDER BY doc_id""".stripMargin,

    "x03_mix_sources" ->
      s"""SELECT doc_id, source, rnk FROM (
         |  SELECT doc_id, source, quota,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ${sqlCoin("doc_id", "m42")}, doc_id) AS BIGINT) AS rnk
         |  FROM documents
         |  JOIN (VALUES ${Quotas.toSeq.sorted.map { case (k, q) =>
              s"('$k', $q)" }.mkString(", ")}) t(src, quota) ON src = source) sub
         |WHERE rnk <= quota
         |ORDER BY doc_id""".stripMargin,

    // same rank + running-sum window; strict-prefix budget filter
    "x23_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($SqlToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |r AS (
         |  SELECT t.doc_id, t.source, t.n_tok, b.budget,
         |    CAST(row_number() OVER w AS BIGINT) AS rnk,
         |    CAST(sum(t.n_tok) OVER w AS BIGINT) AS cum_tok
         |  FROM t
         |  JOIN (VALUES ${TokenBudgets.toSeq.sorted.map { case (k, q) =>
              s"('$k', $q)" }.mkString(", ")}) b(src, budget) ON b.src = t.source
         |  WINDOW w AS (PARTITION BY t.source
         |    ORDER BY ${sqlCoin("doc_id", "tb42")}, t.doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT doc_id, source, n_tok, rnk, cum_tok
         |FROM r WHERE cum_tok <= budget
         |ORDER BY doc_id""".stripMargin,

    "x04_pack_sequences" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, CAST(len($SqlToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |cum AS (
         |  SELECT doc_id, source, n_tok,
         |    coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM toks)
         |SELECT doc_id, source, n_tok,
         |  CAST(floor(CAST(cb AS DOUBLE) / 512) AS BIGINT) AS pack,
         |  CAST(cb % 512 AS BIGINT) AS pack_offset
         |FROM cum ORDER BY doc_id""".stripMargin,

    "x05_bloom_novel" ->
      s"""WITH h AS (SELECT doc_id, md5($SqlNorm) AS h FROM documents)
         |SELECT doc_id FROM h
         |WHERE h NOT IN (SELECT h FROM h WHERE doc_id % 3 <> 0)
         |ORDER BY doc_id""".stripMargin,

    "x12_zorder_key" -> {
      val z = graft.operators.Layout.zValueSql(
        Seq("user_id", "(epoch_us(ts) // 3600000000)"), bits = 16)
      s"""SELECT event_id, CAST($z AS BIGINT) AS zkey
         |FROM events ORDER BY event_id""".stripMargin
    },

    // independent argmax spelling: rank all n hashes per doc, keep
    // rn = 1 (Spark side is a greatest() over (hash, shard) structs)
    "x26_reshard_audit" ->
      """WITH s16 AS (
        |  SELECT doc_id, s AS shard16 FROM (
        |    SELECT d.doc_id, sh.s,
        |      row_number() OVER (PARTITION BY d.doc_id
        |        ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':' ||
        |                     CAST(sh.s AS VARCHAR) || ':rv42') DESC,
        |                 sh.s DESC) AS rn
        |    FROM documents d
        |    CROSS JOIN (SELECT unnest(range(0, 16)) AS s) sh)
        |  WHERE rn = 1),
        |s17 AS (
        |  SELECT doc_id, s AS shard17 FROM (
        |    SELECT d.doc_id, sh.s,
        |      row_number() OVER (PARTITION BY d.doc_id
        |        ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':' ||
        |                     CAST(sh.s AS VARCHAR) || ':rv42') DESC,
        |                 sh.s DESC) AS rn
        |    FROM documents d
        |    CROSS JOIN (SELECT unnest(range(0, 17)) AS s) sh)
        |  WHERE rn = 1)
        |SELECT doc_id, CAST(shard16 AS BIGINT) AS shard16,
        |  CAST(shard17 AS BIGINT) AS shard17,
        |  CAST(CASE WHEN shard16 <> shard17 THEN 1 ELSE 0 END AS BIGINT) AS moved
        |FROM s16 JOIN s17 USING (doc_id) ORDER BY doc_id""".stripMargin,

    // naive global spelling of the sharded rank: one row_number over
    // (level, full coin, id)
    "x25_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars // 200 AS level,
        |         md5(CAST(doc_id AS VARCHAR) || ':cur42') AS coin
        |  FROM documents)
        |SELECT doc_id, CAST(level AS BIGINT) AS level,
        |  CAST(row_number() OVER (ORDER BY level, coin, doc_id) AS BIGINT) AS pos
        |FROM d ORDER BY doc_id""".stripMargin,

    // same zone arithmetic (arrival blocks vs Morton-prefix blocks),
    // same user-band probe, aggregated per layout
    "x24_skip_stats" -> {
      val z = graft.operators.Layout.zValueSql(
        Seq("user_id", "(epoch_us(ts) // 3600000000)"), bits = 16)
      s"""WITH nz AS (
         |  SELECT event_id // 256 AS zone, count(*) AS n,
         |    min(user_id) AS mn, max(user_id) AS mx
         |  FROM events GROUP BY 1),
         |zz AS (
         |  SELECT CAST($z AS BIGINT) >> 8 AS zone, count(*) AS n,
         |    min(user_id) AS mn, max(user_id) AS mx
         |  FROM events GROUP BY 1),
         |au AS (
         |  SELECT 'natural' AS layout, CAST(count(*) AS BIGINT) AS n_zones,
         |    CAST(SUM(CASE WHEN mx < 10 OR mn > 19 THEN 1 ELSE 0 END) AS BIGINT) AS n_prunable,
         |    CAST(SUM(n) AS BIGINT) AS rows_total,
         |    CAST(SUM(CASE WHEN mx < 10 OR mn > 19 THEN n ELSE 0 END) AS BIGINT) AS rows_skipped
         |  FROM nz
         |  UNION ALL
         |  SELECT 'zorder', CAST(count(*) AS BIGINT),
         |    CAST(SUM(CASE WHEN mx < 10 OR mn > 19 THEN 1 ELSE 0 END) AS BIGINT),
         |    CAST(SUM(n) AS BIGINT),
         |    CAST(SUM(CASE WHEN mx < 10 OR mn > 19 THEN n ELSE 0 END) AS BIGINT)
         |  FROM zz)
         |SELECT layout, n_zones, n_prunable, rows_total, rows_skipped
         |FROM au ORDER BY layout""".stripMargin
    },

    "x11_temperature_mix" ->
      s"""SELECT doc_id, source, rnk, quota FROM (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY ${sqlCoin("doc_id", "tm42")}, doc_id) AS BIGINT) AS rnk,
         |    CAST(3 * floor(sqrt(count(*) OVER (PARTITION BY source))) AS BIGINT) AS quota
         |  FROM documents) sub
         |WHERE rnk <= quota
         |ORDER BY doc_id""".stripMargin,

    "x09_chunk_windows" ->
      s"""WITH toks AS (SELECT doc_id, $SqlToks AS t FROM documents),
         |ch AS (
         |  SELECT doc_id, t,
         |    unnest(range(0, CASE WHEN len(t) = 0 THEN 0
         |                         ELSE (len(t) - 1) // 24 + 1 END)) AS chunk_id
         |  FROM toks),
         |sl AS (
         |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |    CAST(chunk_id * 24 AS BIGINT) AS start_tok,
         |    list_slice(t, chunk_id * 24 + 1,
         |      least(chunk_id * 24 + 32, len(t))) AS c
         |  FROM ch)
         |SELECT doc_id, chunk_id, start_tok,
         |  CAST(len(c) AS BIGINT) AS n_tok,
         |  array_to_string(c, ' ') AS chunk
         |FROM sl ORDER BY doc_id, chunk_id""".stripMargin,

    "x10_snapshot_diff" ->
      s"""WITH v1 AS (
         |  SELECT doc_id, md5($SqlNorm) AS h FROM documents WHERE doc_id % 5 <> 4),
         |v2_text AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' version two' ELSE text END AS text
         |  FROM documents WHERE doc_id % 11 <> 3),
         |v2 AS (SELECT doc_id, md5($SqlNorm) AS h FROM v2_text)
         |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
         |  CASE WHEN v1.h IS NULL THEN 'added'
         |       WHEN v2.h IS NULL THEN 'removed'
         |       WHEN v1.h <> v2.h THEN 'changed'
         |       ELSE 'unchanged' END AS status
         |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
         |ORDER BY doc_id""".stripMargin,

    // s07's Lloyd CTE chain (shared helper) + the same coin-ranked
    // per-cluster quota; rnk must match mixSources' (coin, key) order.
    "x16_cluster_sample" ->
      s"""WITH ${SimilarityQueries.kmeansAssignCtes(2)},
         |r AS (
         |  SELECT vec_id, cluster,
         |    row_number() OVER (PARTITION BY cluster ORDER BY
         |      ${sqlCoin("vec_id", "cb7")}, vec_id) AS rnk
         |  FROM afinal)
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 25 ORDER BY vec_id""".stripMargin,

    // Same snapshot construction and the same run-collapse window
    // logic, stated independently: presence (doc_id+v)%13<>0, rev
    // count = |{u in [2,v] : (doc_id+u)%5=0}|, runs split on digest
    // change OR version gap.
    "x15_scd2_history" ->
      """WITH vers AS (SELECT unnest(range(1, 5)) AS version),
        |snaps AS (
        |  SELECT v.version, d.doc_id,
        |    substr(md5(d.text || ' rev' || CAST(
        |      coalesce(list_sum(list_transform(range(2, v.version + 1),
        |        u -> CASE WHEN (d.doc_id + u) % 5 = 0 THEN 1 ELSE 0 END)), 0)
        |      AS VARCHAR)), 1, 12) AS digest
        |  FROM documents d CROSS JOIN vers v
        |  WHERE (d.doc_id + v.version) % 13 <> 0),
        |flagged AS (
        |  SELECT doc_id, version, digest,
        |    CASE WHEN lag(digest) OVER w IS NULL OR lag(digest) OVER w <> digest
        |           OR lag(version) OVER w <> version - 1 THEN 1 ELSE 0 END AS new_run
        |  FROM snaps WINDOW w AS (PARTITION BY doc_id ORDER BY version)),
        |runs AS (
        |  SELECT doc_id, version, digest,
        |    sum(new_run) OVER (PARTITION BY doc_id ORDER BY version) AS run
        |  FROM flagged)
        |SELECT doc_id, min(version) AS v_from, max(version) AS v_to,
        |  min(digest) AS digest,
        |  CAST(CASE WHEN max(version) = 4 THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM runs GROUP BY doc_id, run
        |ORDER BY doc_id, v_from""".stripMargin,

    "x08_source_overlap" ->
      s"""WITH toks AS (SELECT source, $SqlToks AS t FROM documents),
         |sh AS (
         |  SELECT DISTINCT source, shingle FROM (
         |    SELECT source, unnest(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
         |    FROM toks)),
         |sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY source),
         |shared AS (
         |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT source_a, source_b, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / least(sa.sz, sb.sz), 4) AS containment
         |FROM shared
         |JOIN sizes sa ON sa.source = source_a
         |JOIN sizes sb ON sb.source = source_b
         |ORDER BY source_a, source_b""".stripMargin,

    // The oracle states the SIMPLE global-window form; the engine's
    // bucketed two-pass must reproduce it exactly (coin-prefix buckets
    // are prefixes of the global coin order).
    "x06_shuffle_order" ->
      s"""SELECT doc_id,
         |  CAST(row_number() OVER (
         |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':o42'), doc_id) AS BIGINT) AS pos
         |FROM documents ORDER BY pos""".stripMargin,

    "x07_holdout_split" -> {
      // thresholds come from the SAME arithmetic the operator runs
      val whens = Mixing.splitThresholds(HoldoutSplits).init
        .map { case (n, th) => s"WHEN ${sqlCoin("source", "h42")} < '$th' THEN '$n'" }
        .mkString(" ")
      s"""SELECT doc_id, source,
         |  CASE $whens ELSE '${HoldoutSplits.last._1}' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },
  )
}
