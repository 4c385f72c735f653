package graft

import org.apache.spark.sql.functions._

/** Diagnostic: the d03-family's cost model, evaluated on real corpora.
  * For each data dir prints token/char/posting totals, the shingle df
  * histogram's tail, the UNCAPPED inverted-index join cost
  * (Σ df² = candidate pairs), and the [[operators.Dedup.deriveMaxDf]]
  * answer at several per-occurrence budgets with the pair volume each
  * would realize. This is the tool that sized `pairBudgetPerOcc`:
  * run it across a scale ladder and pick the largest budget whose
  * realized pairs/occurrence stays FLAT between the top rungs (r9:
  * 16/occ — uncapped at every oracle SF, binding at sf10).
  * Usage: tools/jrun.sh graft.CorpusStatsDiag <dir> [dir ...] */
object CorpusStatsDiag {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("corpus-stats")
    import spark.implicits._
    for (dir <- args) {
      val docs = Tables.load(spark, dir, "documents")
      val hist = operators.Dedup.shingles(docs, "doc_id", "text")
        .groupBy($"shingle").agg(count(lit(1)).as("df"))
        .groupBy($"df").agg(count(lit(1)).as("n"))
        .orderBy($"df").as[(Long, Long)].collect()
      val occ = hist.map { case (df, n) => df * n }.sum
      val distinct = hist.map(_._2).sum
      def pairs(cap: Long): Double =
        hist.map { case (df, n) => if (df <= cap) df.toDouble * df * n else cap.toDouble * df * n }.sum
      val unc = pairs(hist.last._1)
      val toks = docs.select(sum(size(expr("sanitize_tokens(text)")))).as[Long].head()
      val chars = docs.select(sum(length($"text"))).as[Long].head()
      println(f"[stats] $dir docs=${docs.count()} toks=$toks chars=$chars occ=$occ distinct=$distinct maxdf=${hist.last._1} uncapped_pairs=$unc%.3e pairs_per_occ=${unc / occ}%.1f")
      for (c <- Seq(8.0, 16.0, 32.0, 64.0)) {
        val cap = operators.Dedup.deriveMaxDf(docs, "doc_id", "text", pairBudgetPerOcc = c)
        val eff = if (cap == Int.MaxValue) unc else pairs(cap)
        println(f"[stats]   budget=$c%5.0f/occ -> cap=${if (cap == Int.MaxValue) "uncapped" else cap.toString}%10s realized_pairs=$eff%.3e realized_per_occ=${eff / occ}%.1f")
      }
    }
    spark.stop()
  }
}
