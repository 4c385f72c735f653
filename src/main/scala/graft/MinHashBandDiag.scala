package graft

import org.apache.spark.sql.functions._

/** Diagnostic for d04's postcap residue (VERDICT r10 #3: 2.58× per 2×
  * data was the closest ratio to its bound with no per-mechanism
  * attribution): measures, per data dir, the MinHash-LSH banding that
  * d04's `minHashPairs(n=3, k=64, bands=16)` actually performs over
  * the d04 corpus (documents + planted copies of doc_id < 25):
  *
  *  - `sigRows`   — signature/band exchange volume (∝ corpus size:
  *    if shuffle growth tracks this, it's frame growth, benign);
  *  - `cand`      — the capped candidate budget Σ_buckets C(b,2) over
  *    buckets with 2 ≤ b ≤ 1000 (d04's maxBucketSize): if growth
  *    tracks THIS and it outruns the data ratio, the cause is
  *    bucket-occupancy SKEW (boilerplate shingle mass banding
  *    together), the same second-moment mechanism EmbBucketDiag
  *    attributed for s03;
  *  - occupancy moments (buckets, max, avg) to show where the second
  *    moment lives.
  *
  * Usage: tools/jrun.sh graft.MinHashBandDiag <dir> [dir2 ...]
  */
object MinHashBandDiag {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MinHashBandDiag <dir> [dir2 ...]")
    val spark = GraftSession.get("minhash-band-diag")
    import spark.implicits._
    for (dir <- args) {
      val d = Tables.load(spark, dir, "documents")
        .select($"doc_id", $"text")
      val planted = d.filter($"doc_id" < 25)
        .withColumn("doc_id", $"doc_id" + graft.queries.Planted.Off)
      val corpus = d.unionByName(planted)
      val banded = graft.operators.Dedup.minHashBanded(
        corpus, "doc_id", "text", n = 3, k = 64, bands = 16, seed = 42L)
      val occ = banded.groupBy($"band", $"bkey").agg(count(lit(1)).as("b"))
      val row = occ.agg(
        sum(when($"b".between(2, 1000), expr("b * (b - 1) / 2")).otherwise(0.0)).as("cand"),
        sum(when($"b" > 1000, expr("b * (b - 1) / 2")).otherwise(0.0)).as("candCapped"),
        count(lit(1)).as("nBuckets"), max($"b").as("maxB"), avg($"b").as("avgB"))
        .collect()(0)
      val sigRows = corpus.count()
      println(f"[banddiag] $dir sigRows=$sigRows " +
        f"candidates=${row.getDouble(0)}%.3e candidatesOverCap=${row.getDouble(1)}%.3e " +
        f"buckets=${row.getLong(2)} maxOcc=${row.getLong(3)} avgOcc=${row.getDouble(4)}%.2f")
      // candidate mass by occupancy range — tells WHERE the second
      // moment lives, i.e. what rehashBucketSize would actually bite
      val hist = occ.filter($"b" >= 2)
        .groupBy(
          when($"b" <= 4, "b02_04").when($"b" <= 8, "b05_08")
            .when($"b" <= 16, "b09_16").when($"b" <= 32, "b17_32")
            .when($"b" <= 64, "b33_64").otherwise("b65_up").as("range"))
        .agg(count(lit(1)).as("nb"), sum(expr("b * (b - 1) / 2")).as("cand"))
        .orderBy($"range").collect()
      hist.foreach(h => println(f"[banddiag]   $dir ${h.getString(0)} " +
        f"buckets=${h.getLong(1)} candidates=${h.getDouble(2)}%.3e"))
    }
    spark.stop()
  }
}
