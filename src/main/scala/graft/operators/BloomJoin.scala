package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-pruned anti-join — "which of these incoming documents have we
  * never seen before?", the incremental-ingest primitive of a crawl
  * pipeline. The result is EXACT; the Bloom filter only prunes.
  *
  * Why not a plain anti-join: at 100 TB an anti-join shuffles the
  * ENTIRE incoming corpus on the key. When most incoming rows are
  * novel (the steady state of a crawl), that shuffle is almost all
  * wasted motion. Shape here:
  *
  *  1. Aggregate the seen-side keys into a Bloom filter with Spark's
  *     native `BloomFilterAggregate` over `xxhash64(key)` — the same
  *     expression pair the optimizer's runtime row-level filtering
  *     injects into shuffle joins — built distributed (partial
  *     bitmaps OR-merge associatively), a few MB at fpp≈1%.
  *  2. Map-side test every incoming row with the codegen'd
  *     `BloomFilterMightContain` against the filter as a binary
  *     literal. Bloom-NEGATIVE rows are DEFINITELY novel — they exit
  *     immediately, no shuffle, no join, no UDF boxing.
  *  3. Only bloom-POSITIVE rows (true duplicates + the fpp sliver of
  *     false positives) continue into an exact anti-join against the
  *     seen keys, which removes the false "seen" verdicts.
  *
  * So the wide join processes `dup_rate + fpp` of the input instead of
  * all of it, and correctness never depends on the filter's error
  * rate. NULL keys: `xxhash64(NULL)` is the SEED hash (XxHash64 is
  * never null), so a NULL incoming key may test bloom-positive and
  * take the residual path — where the anti-join's null-never-matches
  * semantics keep it in the output, exactly as a plain anti-join
  * would. The seen side drops NULLs before aggregation so they cannot
  * plant the seed hash in the filter.
  */
object BloomJoin {

  /** Rows of `incoming` whose `keyCol` (string) appears nowhere in
    * `seen`'s `keyCol`. Exact. `expectedItems`/`fpp` size the filter:
    * expectedItems should bound the DISTINCT seen keys — an undersized
    * filter stays correct but prunes less (more rows take the exact
    * join path).
    *
    * Sizing is explicit, never silent: `BloomFilterAggregate` CLAMPS
    * its arguments to `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems` / `.maxNumBits` (4M / 64M-bit defaults) — a clamped
    * filter saturates and the pruning this operator exists for
    * silently vanishes. So the requested sizing is validated against
    * those session confs up front with the conf name in the error;
    * deployments bounding billions of seen keys raise the confs (or
    * partition the seen side) deliberately. */
  def bloomAntiJoin(incoming: DataFrame, seen: DataFrame, keyCol: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"expectedItems=$expectedItems fpp=$fpp out of range")
    val spark = incoming.sparkSession
    // optimal bit count for the requested fpp: -n·ln(p)/ln(2)² —
    // arithmetic, not BloomFilter.create(...).bitSize(), which would
    // allocate the whole bitmap driver-side just to read a number
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val maxItems = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sizing (items=$expectedItems, bits=$numBits) exceeds the " +
        "runtime-filter limits; raise spark.sql.optimizer.runtime.bloomFilter" +
        ".maxNumItems/.maxNumBits or partition the seen side — a silently " +
        "clamped filter saturates and prunes nothing")
    val hashed = new XxHash64(Seq(ColumnBridge.expression(col(keyCol))))
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(hashed, Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
    // Bind the built filter as a SCALAR SUBQUERY — the same binding
    // Spark's InjectRuntimeFilter uses — instead of collecting the
    // bytes and embedding them as a binary Literal. The probe appears
    // in BOTH branches below; a Literal would ship the multi-MB bitmap
    // twice in the serialized plan (2× filter size, growing with
    // maxNumBits — ADVICE r08), while the subquery is planned once,
    // executed once (ReuseSubquery), and its result distributed
    // through the subquery machinery. It also keeps the operator lazy:
    // no eager driver-side aggregation at call time.
    val bloomPlan = seen.filter(col(keyCol).isNotNull).select(bloomAgg.as("bf"))
      .queryExecution.analyzed
    val mightContain =
      ColumnBridge.column(BloomFilterMightContain(ScalarSubquery(bloomPlan), hashed))
    // an empty seen side aggregates to NULL — nothing is seen, so
    // everything is novel and the probe must read "might contain: no"
    val pos = coalesce(mightContain, lit(false))
    val definitelyNovel = incoming.filter(!pos)
    val residual = incoming.filter(pos)
      .join(seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNovel.unionByName(residual)
  }
}
