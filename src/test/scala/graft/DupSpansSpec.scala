package graft

import graft.operators.Dedup

/** Span-level dedup (d10's operator) on a hand-checkable corpus:
  * cross-document boilerplate, self-repetition, and the short-doc
  * zero path. */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  test("window counts, cross-doc and self dup spans, short-doc zeros") {
    val corpus = Seq(
      (1L, "a b c d e"), // windows(3): abc bcd cde
      (2L, "x y z a b c"), // xyz yza zab abc — shares abc with doc 1
      (3L, "a b"), // shorter than w → zeros
      (4L, "q q q q") // qqq qqq — self-repetition is dup
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(corpus, "doc_id", "text", w = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, 0.3333)))
    assert(out(2L) == ((4L, 1L, 0.25)))
    assert(out(3L) == ((0L, 0L, 0.0)))
    assert(out(4L) == ((2L, 2L, 1.0)))
  }

  test("plan tokenizes the corpus exactly once (no join-back re-execution)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val df = SparkEntry.queries("d10_dup_spans")(spark, sfDir)
    df.collect()
    // structural walk (plan.toString reprints AQE stage subtrees, so
    // string-counting double-counts): descend through AQE wrappers,
    // never re-enter a reused exchange
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
      case q: QueryStageExec => p +: nodes(q.plan)
      case _: ReusedExchangeExec => Seq(p)
      case _ => p +: p.children.flatMap(nodes)
    }
    val generates = nodes(df.queryExecution.executedPlan)
      .count(_.nodeName == "Generate")
    assert(generates == 1, s"corpus explode appears $generates times")
  }

  test("w larger than every doc yields all zeros, never an error") {
    val corpus = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.dupSpans(corpus, "doc_id", "text", w = 10).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((0L, 0L)))
  }

  test("repeatedSpans merges consecutive shared grams into maximal spans") {
    // docs 1 and 2 share the 4-token run "p q r s" (with n=3 that is
    // two consecutive shared grams → ONE span of len 4 in each doc);
    // doc 3 shares nothing long enough. Offsets are 0-based token
    // positions: doc 1 has the run at tokens 2..5, doc 2 at 0..3.
    val corpus = Seq(
      (1L, "x y p q r s z"),
      (2L, "p q r s k m n"),
      (3L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", n = 3, minDocs = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 4L), (2L, 0L, 4L)))
    // a doc-internal repeat alone never qualifies (cross-DOC count)
    val selfRep = Seq((1L, "u v w u v w"), (2L, "h i j k l m"))
      .toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(selfRep, "doc_id", "text", n = 3, minDocs = 2L)
      .collect().isEmpty)
    // raising minDocs above the sharing degree empties the result
    assert(Dedup.repeatedSpans(corpus, "doc_id", "text", n = 3, minDocs = 3L)
      .collect().isEmpty)
  }
}
