package graft

import graft.operators.TextAnalysis

/** BM25 ranked retrieval: semantics on a hand-checkable corpus plus
  * the plan properties the oracle can't see (top-k without a global
  * sort; only query-term postings shuffle). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "dup dup join table"), // rare term twice + one common
    (2L, "join join join join table table"), // common terms only, long
    (3L, "dup key"), // rare term once, short
    (4L, "scan filter merge"), // no query terms at all
    (5L, "join key table") // two query terms, one each
  ).toDF("doc_id", "text")

  test("ranking: rare-term docs dominate; no-match docs absent") {
    val out = TextAnalysis
      .bm25TopK(corpus, "doc_id", "text", Seq("dup", "join", "key"), k = 10)
      .collect()
    val ids = out.map(_.getLong(0)).toSeq
    assert(!ids.contains(4L), "doc without any query term was scored")
    // both dup docs outrank every dup-less doc: df(dup)=2 of 5 docs
    // vs df(join)=3 — rational idf 3.5/2.5 vs 2.5/3.5
    val rankOf = ids.zipWithIndex.toMap
    assert(rankOf(1L) < rankOf(2L) && rankOf(1L) < rankOf(5L))
    assert(rankOf(3L) < rankOf(2L) && rankOf(3L) < rankOf(5L))
    // n_terms counts matched query terms, not occurrences
    val nTerms = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nTerms(1L) == 2 && nTerms(3L) == 2 && nTerms(5L) == 2)
    // scores are strictly positive and descending
    val scores = out.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse && scores.forall(_ > 0))
  }

  test("k truncates and ties break by doc id") {
    val out = TextAnalysis
      .bm25TopK(corpus, "doc_id", "text", Seq("dup", "join", "key"), k = 2)
      .collect()
    assert(out.length == 2)
  }

  test("plan: top-k is TakeOrderedAndProject, no cartesian beyond the 1-row stats broadcast") {
    val df = SparkEntry.queries("t17_bm25")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), "global sort instead of top-k")
    assert(!p.contains("CartesianProduct"),
      "non-broadcast cartesian crept into the stats join")
  }
}
