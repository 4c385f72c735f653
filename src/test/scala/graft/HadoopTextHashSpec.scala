package graft

import graft.functions.HadoopTextHash

/** Golden partition-placement parity: SURVEY.md §8.4 verified these
  * keys against the reference's committed part files (32 reducers). */
class HadoopTextHashSpec extends SparkSpec {
  import spark.implicits._

  test("hadoopPartition reproduces the reference's observed part-file placement") {
    val expected = Map(
      "00eggs+fried" -> 0, "1+16" -> 0, "zu+i" -> 26, "000+indians" -> 0)
    val got = expected.keys.toSeq.toDF("k")
      .select($"k", HadoopTextHash.hadoopPartition($"k", 32).as("p"))
      .as[(String, Int)].collect().toMap
    assert(got == expected)
  }

  test("expression matches a JVM-side reimplementation of Text.hashCode") {
    val keys = Seq("a", "abc", "zu+i", "ñ-bytes", "", "0123456789")
    val jvm = keys.map { k =>
      k -> k.getBytes("UTF-8").foldLeft(1)((h, b) => 31 * h + b)
    }.toMap
    val spark_ = keys.toDF("k")
      .select($"k", HadoopTextHash.textHash($"k").as("h"))
      .as[(String, Int)].collect().toMap
    assert(spark_ == jvm)
  }
}
