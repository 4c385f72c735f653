package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full query surface:
  *  - [[queries.RelationalQueries]] — scans, filter/project, joins
  *    (broadcast/shuffle/semi/anti/theta), aggregation (group/rollup/
  *    cube/distinct), windows, sort/limit/top-k, set ops, scalar fns.
  *  - [[queries.TextQueries]] — the reference's bigram pipeline +
  *    n-grams, token counts, quality stats, lang-ID, fingerprints.
  *  - [[queries.DedupQueries]] — exact, n-gram Jaccard, MinHash-LSH,
  *    SimHash dedup.
  *  - [[queries.SimilarityQueries]] — brute-force + LSH ANN,
  *    embedding near-dups, centroids.
  *  - [[queries.EventQueries]] — sessionization, tumbling windows,
  *    profiles.
  *  - [[queries.MultimodalQueries]] — binary media columns with
  *    batched decode plumbing.
  *  - [[queries.PipelineQueries]] — corpus composition: benchmark
  *    decontamination, deterministic sampling/mixing, sequence
  *    packing, bloom-pruned novelty.
  */
object SparkEntry {

  /** Flagship: the reference's bigram computation (WordCountV2.java) on
    * the sf0.001 documents corpus; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TextQueries.queries("t01_bigram_counts")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      MultimodalQueries.queries ++ AdvancedQueries.queries ++
      CurationQueries.queries ++ PipelineQueries.queries ++ GraphQueries.queries

  /** DuckDB-equivalent SQL per query; queries absent here get the
    * driver's weaker rows-only check (hash-family-specific operators:
    * MinHash, SimHash, random-projection LSH). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      MultimodalQueries.oracles ++ AdvancedQueries.oracles ++
      CurationQueries.oracles ++ PipelineQueries.oracles ++ GraphQueries.oracles
}
