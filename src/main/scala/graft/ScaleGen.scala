package graft

import org.apache.spark.sql.functions._

/** Scale-up fixture generator for the ≥10× scale datapoint: shards the
  * sf0.1 corpus K times with DISJOINT key spaces and positional text
  * perturbation, entirely as a distributed dataflow (no driver-side
  * rows, no RNG — shard arithmetic only, so the output is
  * deterministic and the build itself exercises the engine's scale
  * posture).
  *
  * Why perturb instead of copy: a plain ×K copy would make every
  * document an EXACT duplicate of its K−1 siblings, multiplying the
  * near-dup pair count ~K² and poisoning the linearity measurement.
  * Replacing every 13th word (position offset by shard) keeps each
  * shard's INTERNAL duplicate/near-dup structure identical to sf0.1
  * while pushing cross-shard copies below any near-dup threshold
  * (~15% of words differ → 3-gram shingle Jaccard ≈ 0.38), so
  * candidate volume scales ~linearly in K — the property the scale
  * test asserts.
  *
  * Keys: doc_id and l_orderkey offset by shard·(max+1); l_suppkey
  * shifts to `suppkey·K + shard` (suppliers scale with SF, matching
  * TPC-H), so per-supplier group sizes stay constant while group
  * COUNT scales — the shape that holds at 100 TB.
  *
  * Usage: tools/jrun.sh graft.ScaleGen [srcDir] [dstDir] [K]
  * (default sf0.1 → target/sfdata/sf1, K=10; writes documents and
  * lineitem, the tables of the heavy-family scale set).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/sfdata/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.get("scale-gen")
    import spark.implicits._

    val shards = broadcast(spark.range(k).select($"id".cast("int").as("shard")))

    val docs = Tables.load(spark, src, "documents")
    val maxDoc = docs.agg(max($"doc_id")).as[Long].head() + 1
    docs.crossJoin(shards)
      .select(($"doc_id" + $"shard".cast("long") * maxDoc).as("doc_id"),
        expr("""array_join(transform(split(text, ' '),
                 (w, i) -> CASE WHEN (i + shard) % 13 = 0
                           THEN concat(w, 'x', shard) ELSE w END), ' ')""")
          .as("text"),
        $"lang", $"source")
      .withColumn("n_chars", length($"text"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val li = Tables.load(spark, src, "lineitem")
    val maxOk = li.agg(max($"l_orderkey")).as[Long].head() + 1
    li.crossJoin(shards)
      .select(($"l_orderkey" + $"shard".cast("long") * maxOk).as("l_orderkey"),
        $"l_partkey",
        ($"l_suppkey" * k + $"shard").as("l_suppkey"),
        $"l_linenumber", $"l_quantity", $"l_extendedprice",
        $"l_discount", $"l_tax", $"l_returnflag", $"l_linestatus",
        $"l_shipdate")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    println(s"[scalegen] wrote $dst (K=$k from $src)")
    spark.stop()
  }
}
