package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator for the ≥10× scale datapoints: shards a
  * source corpus K times with DISJOINT key spaces and per-shard
  * content perturbation, entirely as a distributed dataflow (no
  * driver-side rows, no RNG — shard arithmetic only, so the output is
  * deterministic and the build itself exercises the engine's scale
  * posture).
  *
  * Why perturb instead of copy: a plain ×K copy would make every
  * document an EXACT duplicate of its K−1 siblings, multiplying the
  * near-dup pair count ~K² and poisoning the linearity measurement.
  *
  *  - documents: every 13th word (position offset by shard) gets a
  *    shard suffix — each shard keeps the source's INTERNAL
  *    duplicate/near-dup structure while cross-shard copies fall to
  *    3-gram shingle Jaccard ≈ 0.38, below any near-dup threshold, so
  *    candidate volume must scale ~linearly for a correctly-bucketed
  *    miner.
  *  - embeddings: each shard applies its own ORTHOGONAL transform —
  *    circular shift by `shard % dim` positions composed with a
  *    Walsh sign mask indexed by `shard / dim` (flip where
  *    `bit_count(i & p)` is odd). Orthogonal ⇒ every intra-shard
  *    inner product (near-dup pairs, cluster geometry) is preserved
  *    EXACTLY; distinct shards' transforms decorrelate cross-shard
  *    copies (different shifts misalign; same shift ⇒ the masks
  *    differ by a balanced Walsh function, driving the dot product
  *    toward 0). Verified at build time: the generator samples the
  *    max cross-shard cosine between copies of one base vector and
  *    fails loudly if any pair stays near-duplicate.
  *
  * Keys scale FK-consistently: doc_id, o_orderkey/l_orderkey (one
  * shared base from orders, the superset), c_custkey/o_custkey,
  * event_id/user_id, vec_id offset by shard·(max+1); l_suppkey and
  * s_suppkey shift to `key·K + shard` (suppliers scale with SF,
  * matching TPC-H), so per-supplier group sizes stay constant while
  * group COUNT scales — the shape that holds at 100 TB. The PART
  * dimension (and nation/region) stays FIXED: part-side degree grows
  * with SF, which is exactly what engages the g04/g05 hub caps the
  * scale audit watches.
  *
  * Usage: tools/jrun.sh graft.ScaleGen [srcDir] [dstDir] [K] [tables]
  * `tables` = comma list or `all`; default `documents,lineitem` (the
  * heavy-family scale set). Events' `ts` lands as the engine's
  * normalized long-nanos view — [[Tables.normalizeTs]] passes longs
  * through, so a generated dir behaves identically to a driver dir.
  */
object ScaleGen {

  private def maxOf(df: DataFrame, c: String): Long = {
    import df.sparkSession.implicits._
    df.agg(max(col(c).cast("long"))).as[Long].head() + 1
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/sfdata/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val requested = if (args.length > 3) args(3) else "documents,lineitem"
    val all = Seq("documents", "lineitem", "orders", "customer", "supplier",
      "part", "nation", "region", "events", "embeddings")
    val tables =
      if (requested == "all") all
      else {
        val ts = requested.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = ts.filterNot(all.contains)
        require(unknown.isEmpty, s"unknown table(s): ${unknown.mkString(",")}")
        ts
      }
    val spark = GraftSession.get("scale-gen")
    import spark.implicits._

    val shards = broadcast(spark.range(k).select($"id".cast("int").as("shard")))
    def write(df: DataFrame, name: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name done")
    }
    def sharded(name: String): DataFrame =
      Tables.load(spark, src, name).crossJoin(shards)

    // one shared orderkey base keeps the lineitem↔orders FK intact
    // across shards (orders is the key superset)
    lazy val maxOk = maxOf(Tables.load(spark, src, "orders"), "o_orderkey")
    lazy val maxCust = maxOf(Tables.load(spark, src, "customer"), "c_custkey")

    for (t <- tables) t match {
      case "documents" =>
        val maxDoc = maxOf(Tables.load(spark, src, "documents"), "doc_id")
        write(sharded("documents")
          .select(($"doc_id" + $"shard".cast("long") * maxDoc).as("doc_id"),
            expr("""array_join(transform(split(text, ' '),
                     (w, i) -> CASE WHEN (i + shard) % 13 = 0
                               THEN concat(w, 'x', shard) ELSE w END), ' ')""")
              .as("text"),
            $"lang", $"source")
          .withColumn("n_chars", length($"text")), "documents")

      case "lineitem" =>
        write(sharded("lineitem")
          .select(($"l_orderkey" + $"shard".cast("long") * maxOk).as("l_orderkey"),
            $"l_partkey",
            ($"l_suppkey" * k + $"shard").as("l_suppkey"),
            $"l_linenumber", $"l_quantity", $"l_extendedprice",
            $"l_discount", $"l_tax", $"l_returnflag", $"l_linestatus",
            $"l_shipdate"), "lineitem")

      case "orders" =>
        write(sharded("orders")
          .select(($"o_orderkey" + $"shard".cast("long") * maxOk).as("o_orderkey"),
            ($"o_custkey" + $"shard".cast("long") * maxCust).as("o_custkey"),
            $"o_orderstatus", $"o_totalprice", $"o_orderdate",
            $"o_orderpriority"), "orders")

      case "customer" =>
        write(sharded("customer")
          .select(($"c_custkey" + $"shard".cast("long") * maxCust).as("c_custkey"),
            $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment"),
          "customer")

      case "supplier" =>
        write(sharded("supplier")
          .select(($"s_suppkey" * k + $"shard").cast("int").as("s_suppkey"),
            $"s_name", $"s_nationkey", $"s_acctbal"), "supplier")

      case "part" | "nation" | "region" =>
        // fixed dimensions: the part space deliberately does NOT scale
        // (degree growth engages the hub caps), nation/region are
        // constant-cardinality reference data
        write(Tables.load(spark, src, t).coalesce(4), t)

      case "events" =>
        val ev = Tables.load(spark, src, "events")
        val maxEid = maxOf(ev, "event_id")
        val maxUid = maxOf(ev, "user_id")
        write(sharded("events")
          .select(($"event_id" + $"shard".cast("long") * maxEid).as("event_id"),
            $"ts",
            ($"user_id" + $"shard".cast("long") * maxUid).as("user_id"),
            $"event_type", $"value", $"props"), "events")

      case "embeddings" =>
        val em = Tables.load(spark, src, "embeddings")
        val dim = em.select(size($"embedding")).as[Int].head()
        require(dim > 1, s"embedding dim $dim too small to shift")
        // orthogonal per-shard transform: circular shift + Walsh signs
        val transformed = sharded("embeddings")
          .select(($"vec_id" + $"shard".cast("long") * maxOf(em, "vec_id")).as("vec_id"),
            expr(
              s"""transform(sequence(0, ${dim - 1}), i ->
                 |  element_at(embedding, ((i + shard) % $dim) + 1) *
                 |  CAST(CASE WHEN bit_count(i & CAST(shard div $dim AS INT)) % 2 = 1
                 |       THEN -1.0 ELSE 1.0 END AS FLOAT))""".stripMargin)
              .as("embedding"),
            $"label")
        write(transformed, "embeddings")
        // build-time decorrelation check: copies of the FIRST base
        // vector across all K shards must not stay near-duplicate
        val minVid = em.agg(min($"vec_id")).as[Long].head()
        val base = maxOf(em, "vec_id")
        val copies = spark.read.parquet(s"$dst/embeddings.parquet")
          .filter($"vec_id" % base === minVid)
        val worst = copies.as("a").crossJoin(copies.as("b"))
          .filter(col("a.vec_id") < col("b.vec_id"))
          .select(expr("cosine_similarity(a.embedding, b.embedding)").as("cos"))
          .agg(max($"cos")).as[Double].head()
        println(f"[scalegen] embeddings max cross-shard cosine = $worst%.4f")
        require(worst < 0.8,
          f"cross-shard embedding copies still near-duplicate (cos=$worst%.3f) — " +
            "the per-shard transform failed to decorrelate; fix before measuring")

      case other => sys.error(s"unhandled table $other")
    }

    println(s"[scalegen] wrote $dst (K=$k from $src, tables=${tables.mkString(",")})")
    spark.stop()
  }
}
