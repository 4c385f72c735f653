package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, TextAnalysis}

/** Partitioning-invariance for the round-7 operators whose oracles
  * rest on determinism claims: BM25's canonical-order float fold and
  * dupSpans' hash counting must produce IDENTICAL results however the
  * input is distributed — a shuffled retry or a different cluster
  * layout must not flip a bit. */
class NewOpDeterminismSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.load(spark, sfDir, "documents")

  private def collected(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("bm25TopK is bit-identical across partitionings") {
    val terms = Seq("dup", "join", "key", "vector")
    val base = collected(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, k = 20))
    for (parts <- Seq(1, 7)) {
      val again = collected(TextAnalysis.bm25TopK(
        docs.repartition(parts), "doc_id", "text", terms, k = 20))
      assert(again == base, s"bm25 drifted at $parts partitions")
    }
  }

  test("dupSpans is identical across partitionings") {
    val base = collected(
      Dedup.dupSpans(docs, "doc_id", "text", w = 10).orderBy("doc_id"))
    val again = collected(
      Dedup.dupSpans(docs.repartition(5), "doc_id", "text", w = 10)
        .orderBy("doc_id"))
    assert(again == base)
  }
}
