package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Similarity-search queries over `embeddings` (64-dim `array<float>`).
  * The brute-force variant carries a DuckDB oracle
  * (`list_cosine_similarity`); the LSH variant is hash-family-specific
  * → rows-only, with recall asserted against brute force in unit tests.
  */
object SimilarityQueries {

  val Dim = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact top-5 neighbors for the first 8 vectors; cosine rounded to
    // 4dp BEFORE ranking so rank ties resolve identically to the oracle.
    "s01_knn_brute" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val q = e.filter($"vec_id" < 8)
      Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5, roundAt = 4)
        .select($"query_id", $"neighbor_id", $"cos", $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // LSH-bucketed ANN, same queries (rows-only check).
    "s02_knn_lsh" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val q = e.filter($"vec_id" < 8)
      Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, dim = Dim)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // IVF ANN: KMeans coarse quantizer + probe-list re-rank (rows-only:
    // clustering is model-specific; recall is asserted in unit tests).
    "s05_knn_ivf" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val q = e.filter($"vec_id" < 8)
      Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4)
        .select($"query_id", $"neighbor_id", round($"cos", 4).as("cos"), $"rank")
        .orderBy($"query_id", $"rank")
    }),

    // Embedding near-duplicate pairs via LSH + exact verify. The raw
    // corpus has no near-dups (max pairwise cosine ≈ 0.51), so the
    // query plants exact duplicates of the first 20 vectors (id+1e6) —
    // the operator must find exactly those; identical vectors share
    // every LSH bucket, so recall here is deterministic and the query
    // is oracle-checkable.
    "s03_embed_neardup" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val planted = e.filter($"vec_id" < 20)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding", $"label")
      Similarity.nearDupPairs(e.unionByName(planted), "vec_id", "embedding",
          minCosine = 0.99, dim = Dim)
        .select($"a_id", $"b_id", round($"cos", 4).as("cos"))
        .orderBy($"a_id", $"b_id")
    }),

    // Label centroids: distributed mean vector per label — exercises
    // array aggregation without ever collecting vectors to the driver.
    "s04_label_centroid_norm" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val byDim = e.select($"label", posexplode($"embedding").as(Seq("i", "v")))
        .groupBy($"label", $"i").agg(avg($"v").as("c"))
      byDim.groupBy($"label")
        .agg(round(sqrt(sum($"c" * $"c")), 4).as("centroid_norm"),
          count(lit(1)).as("n_dims"))
        .orderBy($"label")
    }),
  )

  // Manual double-precision cosine: same sequential accumulation order
  // as the codegen'd CosineSimilarity expression → bit-identical doubles
  // (DuckDB's own list_cosine_similarity accumulates in float — ~1e-7
  // off, enough to flip a 4dp rounding).
  private val SqlCos =
    """(list_sum(list_transform(range(1, len(q.embedding) + 1),
      |    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      | / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  val oracles: Map[String, String] = Map(
    "s03_embed_neardup" ->
      """SELECT vec_id AS a_id, vec_id + 1000000 AS b_id, CAST(1.0 AS DOUBLE) AS cos
        |FROM embeddings WHERE vec_id < 20 ORDER BY a_id""".stripMargin,

    "s01_knn_brute" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($SqlCos, 4) AS cos
         |  FROM embeddings q JOIN embeddings c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "s04_label_centroid_norm" ->
      """WITH bydim AS (
        |  SELECT label, i, avg(v) AS c FROM (
        |    SELECT label, unnest(embedding) AS v,
        |           generate_subscripts(embedding, 1) AS i
        |    FROM embeddings)
        |  GROUP BY label, i)
        |SELECT label, round(sqrt(sum(c*c)), 4) AS centroid_norm, count(*) AS n_dims
        |FROM bydim GROUP BY label ORDER BY label""".stripMargin,
  )
}
