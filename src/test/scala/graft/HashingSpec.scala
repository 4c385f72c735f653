package graft

import org.apache.spark.sql.functions._
import graft.functions.Hashing._
import graft.functions.TextFunctions._

class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("native MinHash signature matches the built-in composition exactly") {
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "a b", "").toDF("text")
    val base = docs.select(tokenize($"text").as("t"))
      .select(array_distinct(ngrams($"t", 2)).as("sh"))
      .select(shingleHashes($"sh").as("bh"))
    val native = base.select(minHashSignature($"bh", 32).as("s")).as[Seq[Long]].collect()
    val builtin = base.select(minHashSignatureBuiltin($"bh", 32).as("s")).as[Seq[Long]].collect()
    assert(native.toSeq == builtin.toSeq)
    assert(native.forall(_.length == 32))
    // empty doc → all-sentinel signature
    assert(native.last.forall(_ == MinHashPrime))
  }

  test("MinHash component-match fraction approximates Jaccard") {
    val a = (1 to 100).map(i => s"tok$i")
    val b = (51 to 150).map(i => s"tok$i") // Jaccard = 50/150 = 1/3
    val df = Seq(a, b).toDF("toks")
      .select(shingleHashes($"toks").as("bh"))
      .select(minHashSignature($"bh", 256).as("sig"))
    val Array(sa, sb) = df.as[Seq[Long]].collect()
    val matches = sa.zip(sb).count { case (x, y) => x == y }
    val est = matches.toDouble / 256
    assert(math.abs(est - 1.0 / 3.0) < 0.1, s"estimate $est too far from 1/3")
  }

  test("SimHash: identical token arrays → identical fingerprints; near → close") {
    val base = (1 to 60).map(i => s"w$i")
    val similar = base.updated(5, "CHANGED").updated(40, "ALSO")
    val different = (1 to 60).map(i => s"z$i")
    val fps = Seq(base, base, similar, different).toDF("toks")
      .select(simHash($"toks").as("fp")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(java.lang.Long.bitCount(fps(0) ^ fps(2)) < 16)
    assert(java.lang.Long.bitCount(fps(0) ^ fps(3)) > 16)
  }

  test("LSH band keys: equal signatures share all bands, disjoint share none") {
    val df = Seq(Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L), Seq(9L, 9L, 9L, 9L))
      .toDF("sig").select(lshBandKeys($"sig", 2, 2).as("bands"))
    val Array(x, y, z) = df.as[Seq[Long]].collect()
    assert(x == y)
    assert(x.intersect(z).isEmpty)
  }
}
