package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-accelerated operators whose RESULTS stay exact — the same
  * contract as [[BloomJoin]]: the probabilistic structure only
  * prunes; a deterministic pass settles the answer.
  *
  * Heavy hitters: finding all values with frequency ≥ θ·N normally
  * costs a full groupBy over the corpus vocabulary — at web scale
  * that shuffles billions of distinct tokens to count the handful of
  * frequent ones. A Count-Min sketch inverts the cost: one map-side
  * aggregation pass builds a fixed-size (KB–MB) sketch that
  * OVERESTIMATES every count (collisions only add), so
  * `estimate(x) ≥ true(x)` — filtering rows to tokens whose estimate
  * clears the threshold can never drop a true heavy hitter. The exact
  * groupBy then runs over only the surviving rows (true heavies +
  * collision noise bounded by eps·N), and the final threshold filter
  * discards the false positives. Shuffle volume drops from
  * |vocabulary| to |candidates|.
  *
  * The membership probe stays a Scala UDF deliberately: unlike Bloom
  * (where [[BloomJoin]] uses Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` pair), Spark ships no Catalyst
  * expression that PROBES a CountMinSketch — `count_min_sketch` only
  * builds the binary sketch, and deserializing it per row in SQL
  * would be worse than the one boxed call. The UDF gates a wide
  * aggregation, so it is off the hot path by construction.
  */
object Sketches {

  /** All values of `valueCol` (string) occurring in at least
    * `minFraction` of rows: `(valueCol, n)` exact counts, provably
    * complete (CMS never underestimates). `eps`/`confidence` size the
    * sketch — eps·N bounds the overestimate, so smaller eps = fewer
    * false candidates through the exact pass. */
  def heavyHitters(df: DataFrame, valueCol: String, minFraction: Double,
                   eps: Double = 0.0001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(minFraction > 0 && minFraction <= 1,
      s"minFraction=$minFraction out of (0, 1]")
    val spark = df.sparkSession
    val cms = df.stat.countMinSketch(valueCol, eps, confidence, seed)
    val threshold = math.ceil(minFraction * cms.totalCount()).toLong
    val bc = spark.sparkContext.broadcast(cms)
    val mightBeHeavy = udf((v: String) =>
      v != null && bc.value.estimateCount(v) >= threshold)
    df.filter(mightBeHeavy(col(valueCol)))
      .groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
