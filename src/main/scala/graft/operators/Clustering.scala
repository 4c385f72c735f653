package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic k-means in SCALED INTEGER arithmetic — the auditable
  * clustering a curation pipeline wants when cluster membership feeds
  * downstream decisions (cluster-balanced sampling, diversity quotas,
  * per-cluster quality thresholds) that must be bit-reproducible
  * across runs, partitionings, and engines. Complements the ML KMeans
  * inside [[Similarity.ivfTopK]]: that one is a throwaway physical
  * index (recall-tested, engine-specific), this one is a REPRODUCIBLE
  * data artifact (exact-oracle-testable).
  *
  * Determinism, by construction:
  *  - coordinates quantize once to `round((x + shift) * quantScale)`
  *    as Longs, with `shift` chosen so every value is non-negative —
  *    integer sums are associative (no float summation-order drift)
  *    and non-negative integer division truncates identically
  *    everywhere;
  *  - assignment is argmin of the exact integer squared L2 distance,
  *    ties broken by the smaller cluster id;
  *  - centroid update is the per-dimension integer mean (floor);
  *    empty clusters keep their previous centroid;
  *  - init is the first k points by id — a fixed, data-defined seed.
  *
  * Scale shape: the quantized points are materialized ONCE and scanned
  * `iters + 1` times; each assignment is MAP-SIDE (centroids are a
  * k × dim literal — the same "model on the driver" posture as Spark
  * ML, k·dim Longs, never the data); each update is one partial+final
  * aggregate shuffling only k·dim rows of (sum, count) state. Nothing
  * driver-side ever holds points.
  */
object Clustering {

  /** Fitted-codebook memo (same posture as Similarity's IVF
    * quantizer cache): the centroids are deterministic in the input,
    * so a cache hit changes nothing but the number of Lloyd scans a
    * session pays. Keyed by caller-supplied corpus identity + fit
    * params; size-capped wholesale. */
  private val centroidCache =
    new graft.functions.BoundedMemo[(String, Int, Int, Long, Double),
      Array[Array[Long]]](32)

  /** Lloyd iterations as above; returns `(idCol, cluster)` for every
    * point. `points(idCol)` must be unique; ids `0 .. k-1` must exist
    * (they seed the initial centroids). */
  def kmeansInt(points: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int, quantScale: Long = 1000000L,
                shift: Double = 1.0,
                cacheKey: Option[String] = None): DataFrame =
    kmeansIntModel(points, idCol, vecCol, k, iters, quantScale, shift,
      cacheKey)._1

  /** [[kmeansInt]] plus the fitted model: the final quantized
    * centroids (k × dim Longs — the "model on the driver" posture;
    * never the data). Callers that score NEW points against the
    * codebook (PQ asymmetric-distance tables, assignment of a probe
    * stream) need the centroids themselves, not just the training
    * assignment. `cacheKey` (an identity for the points frame, e.g.
    * "sfdir#sub0") reuses a previously fitted codebook — the fit is
    * deterministic, so the hit is exact; assignment still runs. */
  def kmeansIntModel(points: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int, quantScale: Long = 1000000L,
                     shift: Double = 1.0,
                     cacheKey: Option[String] = None): (DataFrame, Array[Array[Long]]) = {
    require(k >= 1, s"k=$k must be >= 1")
    require(iters >= 0, s"iters=$iters must be >= 0")
    val q = points.select(col(idCol).cast("long").as("id"),
        quantized(col(vecCol), quantScale, shift).as("q"))
      .transform(Checkpoints.materialize)

    def assigned(cs: Array[Array[Long]]): DataFrame = {
      val candidates: Seq[Column] = cs.zipWithIndex.map { case (c, j) =>
        val cLit = array(c.map(lit(_)): _*)
        struct(
          aggregate(zip_with(col("q"), cLit, (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d"),
          lit(j.toLong).as("j"))
      }.toSeq
      q.withColumn("cluster", least(candidates: _*).getField("j"))
    }

    def fit(): Array[Array[Long]] = {
      var centroids: Array[Array[Long]] = q.filter(col("id") < k)
        .orderBy(col("id")).select(col("q")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(centroids.length == k,
        s"need points with ids 0..${k - 1} to seed $k centroids, found ${centroids.length}")
      val dim = centroids.head.length
      for (_ <- 1 to iters) {
        val a = assigned(centroids)
        val perDim = a.select(col("cluster"), posexplode(col("q")).as(Seq("i", "x")))
          .groupBy(col("cluster"), col("i"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .select(col("cluster"), col("i"), expr("s div n").as("c"))
          .collect()
        val next = centroids.map(_.clone)
        perDim.foreach { r =>
          next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2)
        }
        centroids = next
        require(centroids.forall(_.length == dim))
      }
      centroids
    }

    val centroids = cacheKey match {
      case Some(key) => centroidCache.getOrCompute(
        (key, k, iters, quantScale, shift), _ => fit())
      case None => fit()
    }
    (assigned(centroids).select(col("id").as(idCol), col("cluster")),
      centroids)
  }

  /** Quantize a raw vector column onto the SAME integer grid the
    * codebook was fitted on — the scoring-side twin of the fit-side
    * quantization above. */
  def quantized(vec: Column, quantScale: Long = 1000000L,
                shift: Double = 1.0): Column =
    transform(vec, x => round((x.cast("double") + shift) * quantScale).cast("long"))
}
