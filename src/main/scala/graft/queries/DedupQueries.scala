package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Deduplication queries over `documents`. Exact and n-gram-Jaccard
  * variants carry DuckDB oracles (the math is rational-of-integers, so
  * both engines produce bit-identical doubles); MinHash-LSH and
  * SimHash are hash-family-specific and get rows-only checks — their
  * correctness is covered by unit tests against the exact variants.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val SqlNorm =
    """array_to_string(list_filter(string_split_regex(lower(regexp_replace(text, '([^\s\w]|_)+', ' ', 'g')), '\s+'), x -> x <> ''), ' ')"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup groups: digest → (survivor, multiplicity).
    "d01_exact_groups" -> ((s, dir) => {
      import s.implicits._
      Dedup.exactGroups(docs(s, dir), "doc_id", "text")
        .select($"h", $"keep_id", $"n_dups")
        .orderBy($"h")
    }),

    "d02_exact_keep" -> ((s, dir) => {
      import s.implicits._
      Dedup.exactKeepIds(docs(s, dir), "doc_id", "text").orderBy($"doc_id")
    }),

    // Exact pairwise n-gram Jaccard ≥ 0.5 via the shingle inverted index.
    "d03_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", n = 3, minJaccard = 0.5)
        .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
        .orderBy($"a_id", $"b_id")
    }),

    // MinHash-LSH near-dup pairs (rows-only: hash-family-specific).
    "d04_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      Dedup.minHashPairs(docs(s, dir), "doc_id", "text",
          n = 3, k = 64, bands = 16, minJaccard = 0.5)
        .select($"a_id", $"b_id", round($"jaccard", 4).as("jaccard"))
        .orderBy($"a_id", $"b_id")
    }),

    // SimHash near-dup pairs, Hamming ≤ 3 (rows-only).
    "d05_simhash" -> ((s, dir) => {
      import s.implicits._
      Dedup.simHashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
        .select($"a_id", $"b_id", $"hamming".cast("long").as("hamming"))
        .orderBy($"a_id", $"b_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "d01_exact_groups" ->
      s"""SELECT md5($SqlNorm) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n_dups
         |FROM documents GROUP BY h ORDER BY h""".stripMargin,

    "d02_exact_keep" ->
      s"""SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
         |FROM documents GROUP BY md5($SqlNorm) ORDER BY doc_id""".stripMargin,

    "d03_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(text, '([^\s\w]|_)+', ' ', 'g')), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        |    FROM toks)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT a_id, b_id, round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = a_id
        |JOIN sizes sb ON sb.doc_id = b_id
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
