package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Dedup}

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomAntiJoin equals the plain anti-join, even with a saturated filter") {
    val incoming = spark.range(0, 5000)
      .select(md5(col("id").cast("string").cast("binary")).as("h"), col("id"))
    val seen = spark.range(0, 5000).filter(col("id") % 3 =!= 0)
      .select(md5(col("id").cast("string").cast("binary")).as("h"))
    val expected = incoming.join(seen, Seq("h"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq

    val exact = BloomJoin.bloomAntiJoin(incoming, seen, "h",
        expectedItems = 10000L, fpp = 0.01)
      .select("id").as[Long].collect().sorted.toSeq
    assert(exact === expected)

    // grossly undersized filter → huge fpp → everything rides the
    // residual join; the result must not change
    val saturated = BloomJoin.bloomAntiJoin(incoming, seen, "h",
        expectedItems = 10L, fpp = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(saturated === expected)
  }

  test("bloom prunes: definitely-novel rows bypass the residual join") {
    // disjoint key spaces → zero true hits; at fpp 1% the residual
    // side must be a tiny fraction of incoming
    val incoming = spark.range(100000, 110000)
      .select(col("id").cast("string").as("h"))
    val seen = spark.range(0, 10000).select(col("id").cast("string").as("h"))
    val bloom = seen.stat.bloomFilter("h", 20000L, 0.01)
    val falsePos = incoming.as[String].collect().count(bloom.mightContainString)
    assert(falsePos < 500, s"$falsePos bloom false positives of 10000 at fpp 0.01")
    // and the exact result is still everything
    val out = BloomJoin.bloomAntiJoin(incoming, seen, "h", 20000L, 0.01)
    assert(out.count() === 10000L)
  }

  test("duplicate incoming keys and nulls survive with multiplicity") {
    val incoming = Seq("a", "a", "b", null, "c").toDF("h")
    val seen = Seq("b").toDF("h")
    val out = BloomJoin.bloomAntiJoin(incoming, seen, "h").as[String].collect()
    // 'a' twice (dup preserved), null kept (not in seen), 'b' dropped
    assert(out.count(_ == "a") === 2)
    assert(out.count(_ == null) === 1)
    assert(out.count(_ == "c") === 1)
    assert(!out.contains("b"))
  }

  test("x05 shape: content-digest novelty over the documents table") {
    val d = Tables.load(spark, sfDir, "documents")
    val incoming = d.select($"doc_id", Dedup.contentHash($"text").as("h"))
    val seen = d.filter($"doc_id" % 3 =!= 0).select(Dedup.contentHash($"text").as("h"))
    val novel = BloomJoin.bloomAntiJoin(incoming, seen, "h", 1000L, 0.01)
    val expected = incoming.join(seen, Seq("h"), "left_anti")
    assert(novel.select("doc_id").except(expected.select("doc_id")).count() === 0)
    assert(expected.select("doc_id").except(novel.select("doc_id")).count() === 0)
  }
}
