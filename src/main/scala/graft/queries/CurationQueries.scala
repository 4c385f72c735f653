package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.{Curation, TextAnalysis}

/** The end-to-end curation pipeline as a driver query with a full
  * DuckDB oracle. Every stage is deterministic arithmetic (lang-ID
  * case chain, integer-rational quality ratios, md5 digest, exact
  * Jaccard on the near-dup pairs), so the oracle recomputes the whole
  * pipeline in SQL. The Spark side's near-dup stage is MinHash-LSH;
  * equality with the oracle's exact-Jaccard pairs rests on the same
  * precondition d04 tests (total LSH miss probability < 1e-4 over the
  * corpus's organic pairs — DedupSpec), applied to a survivor SUBSET
  * of that corpus.
  */
object CurationQueries {

  private val SqlToks =
    """list_filter(string_split_regex(lower(regexp_replace(text, '([^\s\w]|_)+', ' ', 'g')), '\s+'), x -> x <> '')"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curate" -> ((s, dir) => {
      import s.implicits._
      Curation.curate(Tables.load(s, dir, "documents"), "doc_id", "text",
          Curation.Config(lang = "en", minTokens = 30L, minAlnumRatio = 0.5,
            nearDupJaccard = Some(0.5)))
        .orderBy($"doc_id")
    }),
  )

  private def oracleSql: String = {
    val hits = TextAnalysis.LangMarkers.map { case (lang, ms) =>
      val set = ms.map(m => s"'$m'").mkString("[", ", ", "]")
      lang -> s"len(list_filter(t, x -> list_contains($set, x)))"
    }
    val best = hits.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    val cases = hits.map { case (lang, h) =>
      s"WHEN $h > 0 AND $h = best THEN '$lang'"
    }.mkString(" ")
    s"""WITH toks AS (SELECT doc_id, text, $SqlToks AS t FROM documents),
       |scored0 AS (
       |  SELECT doc_id, t, $best AS best,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    CASE WHEN len(text) = 0 THEN 0.0
       |      ELSE CAST(len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / len(text) END AS alnum_ratio
       |  FROM toks),
       |scored AS (
       |  SELECT doc_id, t, n_tokens, alnum_ratio,
       |    CASE $cases ELSE 'und' END AS pred_lang
       |  FROM scored0),
       |filtered AS (
       |  SELECT * FROM scored
       |  WHERE pred_lang = 'en' AND n_tokens >= 30 AND alnum_ratio >= 0.5),
       |keep AS (
       |  SELECT min(doc_id) AS doc_id FROM filtered
       |  GROUP BY md5(array_to_string(t, ' '))),
       |ded AS (SELECT f.* FROM filtered f JOIN keep k USING (doc_id)),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |    FROM ded)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |dropped AS (
       |  SELECT DISTINCT b_id AS doc_id FROM inter
       |  JOIN sizes sa ON sa.doc_id = a_id
       |  JOIN sizes sb ON sb.doc_id = b_id
       |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5)
       |SELECT doc_id, pred_lang, n_tokens, round(alnum_ratio, 4) AS alnum_ratio
       |FROM ded WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map("p01_curate" -> oracleSql)
}
