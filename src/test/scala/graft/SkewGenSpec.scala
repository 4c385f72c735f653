package graft

import org.apache.spark.sql.functions._

/** The skew generator's draw expressions must actually produce the
  * adversarial head [[SkewDrill]] claims to test: deterministic
  * (same input ⇒ same corpus — a rerun must not invalidate cached
  * fixtures), bounded to the hot set, and log-uniform (rank r carries
  * ~1/r of the hot mass — the Zipf s=1 head shape, so the top key is
  * a genuine hot spot, not 1/H of a uniform smear). */
class SkewGenSpec extends SparkSpec {
  import spark.implicits._

  test("unif is deterministic, uniform-ish, and salt-decorrelated") {
    val df = spark.range(100000L).select(
      ScaleGen.unif("a", $"id").as("ua"), ScaleGen.unif("b", $"id").as("ub"))
    val again = spark.range(100000L).select(ScaleGen.unif("a", $"id").as("ua2"))
    // deterministic across evaluations
    val joined = df.select($"ua").withColumn("rn", monotonically_increasing_id())
      .join(again.withColumn("rn", monotonically_increasing_id()), "rn")
    assert(joined.filter($"ua" =!= $"ua2").count() === 0L)
    val row = df.agg(min($"ua"), max($"ua"), avg($"ua"),
      corr($"ua", $"ub")).collect()(0)
    assert(row.getDouble(0) >= 0.0 && row.getDouble(1) < 1.0)
    assert(math.abs(row.getDouble(2) - 0.5) < 0.01, s"mean ${row.getDouble(2)}")
    // distinct salts give independent draws (|corr| small)
    assert(math.abs(row.getDouble(3)) < 0.02, s"corr ${row.getDouble(3)}")
  }

  test("documents token-skew path draws rank 1 (the hottest word)") {
    // the documents branch previously re-typed the rank formula in SQL
    // with floor(exp(u·ln(h)))+1 ∈ [2,h] — rank 1 was never drawn; the
    // shared skewTokenText column must hit the FIRST hot-array entry
    val h = 8
    val hot = typedLit((1 to h).map(r => s"hot$r"))
    val docs = spark.range(2000L).select(
      $"id".cast("string").as("doc_id"),
      lit(Seq.fill(20)("w").mkString(" ")).as("text"))
    val counts = docs
      .select(ScaleGen.skewTokenText($"text", $"doc_id", hot, 0.9, h).as("t"))
      .select(explode(split($"t", " ")).as("w"))
      .filter($"w".startsWith("hot"))
      .groupBy($"w").count().as[(String, Long)].collect().toMap
    assert(counts.size == h, s"only ${counts.size} of $h hot ranks drawn: ${counts.keys}")
    val total = counts.values.sum.toDouble
    val top = counts("hot1") / total
    // log-uniform: rank-1 mass ≈ ln(2)/ln(h+1) ≈ 31.5% at h=8
    assert(top > 0.2 && top < 0.45, s"rank-1 mass $top")
    assert(counts("hot1") > 3L * counts(s"hot$h"),
      s"head ${counts("hot1")} vs tail ${counts(s"hot$h")} — not a Zipf head")
  }

  test("zipfRank is 1..H with ~1/r mass decay") {
    val h = 64
    val counts = spark.range(200000L)
      .select(ScaleGen.zipfRank(ScaleGen.unif("r", $"id"), h).as("r"))
      .groupBy($"r").count().as[(Int, Long)].collect().toMap
    assert(counts.keys.min >= 1 && counts.keys.max <= h)
    assert(counts.size == h, s"only ${counts.size} of $h ranks drawn")
    // log-uniform: mass(rank 1) ≈ ln(2)/ln(H) of total ≈ 16.7% at H=64,
    // and the head dominates the tail by ~rank ratio
    val total = counts.values.sum.toDouble
    val top = counts(1) / total
    assert(top > 0.10 && top < 0.25, s"rank-1 mass $top")
    assert(counts(1) > 8L * counts(h),
      s"head ${counts(1)} vs tail ${counts(h)} — not a Zipf head")
  }
}
