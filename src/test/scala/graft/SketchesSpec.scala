package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenize
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def tokens = Tables.load(spark, sfDir, "documents")
    .select(explode(tokenize($"text")).as("token"))

  private def brute(minFraction: Double): Map[String, Long] = {
    val t = tokens
    val total = t.count()
    val threshold = math.ceil(minFraction * total).toLong
    t.groupBy("token").count().filter(col("count") >= threshold)
      .as[(String, Long)].collect().toMap
  }

  test("heavyHitters equals the exact threshold query") {
    val got = Sketches.heavyHitters(tokens, "token", 0.002)
      .as[(String, Long)].collect().toMap
    assert(got === brute(0.002))
    assert(got.nonEmpty, "degenerate test: no heavy hitters at 0.002")
  }

  test("a coarse sketch (huge eps) lets more candidates through but never changes the result") {
    // eps 0.1 → overestimates by up to 10% of N → most tokens become
    // candidates; the exact pass must still settle to the same answer
    val got = Sketches.heavyHitters(tokens, "token", 0.005, eps = 0.1)
      .as[(String, Long)].collect().toMap
    assert(got === brute(0.005))
  }

  test("minFraction edges: 1.0 on a constant column keeps it; bad fractions rejected") {
    val const = spark.range(0, 100).select(lit("only").as("v"))
    val got = Sketches.heavyHitters(const, "v", 1.0).as[(String, Long)].collect()
    assert(got.toSeq === Seq(("only", 100L)))
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(const, "v", 0.0)
    }
    // null values never count as heavy
    val withNulls = spark.range(0, 10)
      .select(when($"id" < 5, lit("x")).otherwise(lit(null)).as("v"))
    val hh = Sketches.heavyHitters(withNulls, "v", 0.1)
      .as[(String, Long)].collect().toMap
    assert(hh === Map("x" -> 5L))
  }
}
