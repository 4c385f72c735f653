package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Similarity

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50).cache()

  test("native cosine matches built-in composition on real embeddings") {
    val pairs = emb.select($"vec_id".as("a"), $"embedding".as("va"))
      .crossJoin(emb.select($"vec_id".as("b"), $"embedding".as("vb")))
      .filter($"a" < $"b").limit(200)
    val diffs = pairs
      .select((cosineSim($"va", $"vb") - cosineSimBuiltin($"va", $"vb")).as("d"))
      .agg(max(abs($"d"))).as[Double].head()
    assert(diffs < 1e-12, s"native vs builtin cosine diverged by $diffs")
  }

  test("cosine identities: self = 1, opposite = -1, orthogonal = 0, zero-safe") {
    val v = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 0f, 0f), Seq(-1f, 0f, 0f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(0f, 0f, 0f), Seq(1f, 1f, 1f))).toDF("a", "b")
    val got = v.select(round(cosineSim($"a", $"b"), 9)).as[Double].collect().toSeq
    assert(got == Seq(1.0, -1.0, 0.0, 0.0))
  }

  test("native RP signature matches built-in hyperplane composition") {
    val native = emb.select($"vec_id", rpSignature($"embedding", 4, 8, 7L).as("s"))
      .orderBy($"vec_id").as[(Long, Seq[Long])].collect()
    val builtin = emb.select($"vec_id",
        Similarity.bucketKeysBuiltin($"embedding", 4, 8, 64, 7L).as("s"))
      .orderBy($"vec_id").as[(Long, Seq[Long])].collect()
    assert(native.toSeq == builtin.toSeq)
  }

  test("RP signature is deterministic and discriminates") {
    val sigs = emb.select(rpSignature($"embedding", 8, 12, 42L).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs.forall(_.length == 8))
    // different vectors should rarely share a full signature
    assert(sigs.map(_.mkString(",")).distinct.length > 40)
  }
}
