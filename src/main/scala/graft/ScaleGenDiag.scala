package graft

import org.apache.spark.sql.functions._

/** Measures ADVICE r09's collision question about [[ScaleGen]]'s word
  * map. The per-shard class-0 rotation is injective FOR A FIXED
  * rotation, but the overall type map m_s (rotate class-0 words, keep
  * class-1/2 unchanged) is not injective by construction: a rotated
  * class-0 word can land on an unchanged class-1/2 type, or two
  * class-0 words under different per-word rotations can share an
  * image. Each collision merges two word types within a shard and
  * perturbs the "within-shard Jaccard preserved EXACTLY" invariant
  * the scale ladder leans on.
  *
  * This diag measures the realized rate on the actual corpus
  * vocabulary, against the generator's own expression
  * ([[ScaleGen.rotateSql]] — shared, so the measurement cannot drift
  * from the map): per shard, `merged = |types| − |image(m_s(types))|`.
  * The positional backstop (`i % _m`) additionally rewrites
  * occurrences of class-1/2 words at selected positions; that path is
  * not a type map (the same type maps differently by position), so
  * its collisions are occurrence-local and strictly rarer — the class
  * rule measured here is the dominant term.
  *
  * Usage: tools/jrun.sh graft.ScaleGenDiag [srcDir] [K]
  */
object ScaleGenDiag {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.get("scalegen-diag")
    val types = Tables.load(spark, src, "documents")
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .repartition(col("w"))
    val n = types.count()
    var worst = 0L
    for (s <- 1 until k) {
      val mapped = types.select(
        expr(s"CASE WHEN pmod(hash(w), 3) = 0 THEN ${ScaleGen.rotateSql("w", s.toString)} ELSE w END")
          .as("v"))
      val m = mapped.distinct().count()
      val merged = n - m
      worst = math.max(worst, merged)
      println(f"[scalegendiag] shard=$s types=$n images=$m merged=$merged rate=${merged.toDouble / n}%.2e")
    }
    println(f"[scalegendiag] worst shard merged=$worst of $n types (${worst.toDouble / n}%.2e)")
    spark.stop()
  }
}
