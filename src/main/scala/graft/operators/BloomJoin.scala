package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned anti-join — "which of these incoming documents have we
  * never seen before?", the incremental-ingest primitive of a crawl
  * pipeline. The result is EXACT; the Bloom filter only prunes.
  *
  * Why not a plain anti-join: at 100 TB an anti-join shuffles the
  * ENTIRE incoming corpus on the key. When most incoming rows are
  * novel (the steady state of a crawl), that shuffle is almost all
  * wasted motion. Shape here:
  *
  *  1. Aggregate the seen-side keys into a Bloom filter
  *     (`DataFrameStatFunctions.bloomFilter` — built distributed,
  *     merged on the driver, a few MB at fpp=1%) and broadcast it.
  *  2. Map-side test every incoming row. Bloom-NEGATIVE rows are
  *     DEFINITELY novel — they exit immediately, no shuffle, no join.
  *  3. Only bloom-POSITIVE rows (true duplicates + the fpp sliver of
  *     false positives) continue into an exact anti-join against the
  *     seen keys, which removes the false "seen" verdicts.
  *
  * So the wide join processes `dup_rate + fpp` of the input instead of
  * all of it, and correctness never depends on the filter's error
  * rate. (This is the pattern Spark's own runtime row-level filtering
  * applies inside shuffle joins; staging it explicitly lets the cheap
  * path skip the join operator entirely and makes the filter
  * reusable across batches.)
  *
  * The membership test is a Scala UDF (one boxed call per row, outside
  * codegen) — measured fine because it gates a wide join; a native
  * `Expression` over the broadcast bitmap is the upgrade path if the
  * test itself ever becomes the bottleneck.
  */
object BloomJoin {

  /** Rows of `incoming` whose `keyCol` (string) appears nowhere in
    * `seen`'s `keyCol`. Exact. `expectedItems`/`fpp` size the filter:
    * expectedItems should bound the DISTINCT seen keys — an undersized
    * filter stays correct but prunes less (more rows take the exact
    * join path). */
  def bloomAntiJoin(incoming: DataFrame, seen: DataFrame, keyCol: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = incoming.sparkSession
    val bloom = seen.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: String) => k != null && bc.value.mightContainString(k))
    val definitelyNovel = incoming.filter(!mightContain(col(keyCol)))
    val residual = incoming.filter(mightContain(col(keyCol)))
      .join(seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNovel.unionByName(residual)
  }
}
