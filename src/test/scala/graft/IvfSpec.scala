package graft

import graft.operators.Similarity

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-k: structure is valid and recall beats the probe ratio") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val q = emb.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
        nLists = 16, nProbe = 4)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Long)].collect()
    // every query answered with k ranked rows
    assert(ivf.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    val recall = (brute & ivf.map(t => (t._1, t._2)).toSet).size.toDouble / brute.size
    // probing 4/16 lists blindly would give ~25%; the quantizer must do
    // clearly better even on near-random vectors
    assert(recall >= 0.5, s"IVF recall $recall")
  }
}
