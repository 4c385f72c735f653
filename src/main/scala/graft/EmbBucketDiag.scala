package graft

import org.apache.spark.sql.functions._

/** Diagnostic for the s03 postcap overage: measures the LSH bucket
  * occupancy distribution and the exact candidate-pair budget
  * Σ_buckets b·(b−1)/2 (per table, summed) that nearDupPairs' bucket
  * self-join generates, at each given data dir with its corpus-derived
  * bit width. If candidate growth between two dirs exceeds the data
  * ratio, the cause is occupancy SKEW (sign-projection bits splitting
  * structured embeddings unevenly), not a planning defect — the
  * constant-occupancy derivation keeps the MEAN flat but cannot
  * flatten the second moment.
  *
  * Usage: tools/jrun.sh graft.EmbBucketDiag <dir> [dir2 ...]
  */
object EmbBucketDiag {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EmbBucketDiag <dir> [dir2 ...]")
    val spark = GraftSession.get("emb-bucket-diag")
    for (dir <- args) {
      val e = Tables.load(spark, dir, "embeddings")
      val bits = graft.queries.DerivedCaps.embBitsFor(spark, dir)
      // the exact family s03's nearDupPairs uses: 8 tables, derived
      // bits, dim 64, seed 42
      val bucketed = e.select(col("vec_id"),
        posexplode(graft.operators.Similarity.bucketKeys(
          col("embedding"), tables = 8, bits = bits, dim = 64, seed = 42L))
          .as(Seq("table", "bucket")))
      val row = bucketed.groupBy(col("table"), col("bucket"))
        .agg(count(lit(1)).as("b"))
        .agg(sum(expr("b * (b - 1) / 2")).as("cand"),
          count(lit(1)).as("nBuckets"), max(col("b")).as("maxB"),
          avg(col("b")).as("avgB"))
        .collect()(0)
      val n = e.count()
      println(f"[embdiag] $dir n=$n bits=$bits candidates=${row.getDouble(0)}%.3e " +
        f"buckets=${row.getLong(1)} maxOcc=${row.getLong(2)} avgOcc=${row.getDouble(3)}%.1f")
    }
    spark.stop()
  }
}
