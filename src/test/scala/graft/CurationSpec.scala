package graft

import graft.operators.Curation
import graft.operators.Curation.Config

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // every stage gets a victim: non-English (1), too short (2),
  // low alnum (3), exact dup of 0 (4), near-dup of 0 (5), clean (0, 6)
  private def longEn(tail: String) =
    ("the cat and the dog walked to the old market in town because it was " +
      "a bright morning and everyone wanted fresh bread for the long day " +
      "that was waiting ahead of them all " + tail).trim
  private lazy val corpus = Seq(
    (0L, longEn("")),
    (1L, "der hund und die katze gingen zu dem alten markt weil das ein heller morgen war und " +
      "alle frisches brot wollten fuer den langen tag der vor ihnen lag und das ist nicht wenig"),
    (2L, "the short one"),
    (3L, ("the cat and the dog walked to the market " + "!@#$%^&*()" * 40)
      + " it was a day for the people in town and it is that was for"),
    (4L, longEn("").toUpperCase + "!!!"),
    (5L, longEn("with one tiny change at the very end")),
    (6L, "a completely different english story where the river met the sea and the " +
      "children of the village played in the sand until the sun went down over the " +
      "hills and it was time to go home to sleep for the night"),
  ).toDF("doc_id", "text")

  test("each stage drops its victim; clean docs survive with scores") {
    val out = Curation.curate(corpus, "doc_id", "text",
        Config(lang = "en", minTokens = 30L, minAlnumRatio = 0.5,
          nearDupJaccard = Some(0.5)))
      .orderBy($"doc_id")
      .select($"doc_id", $"pred_lang", $"n_tokens")
      .as[(Long, String, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 6L),
      s"expected survivors 0 and 6, got ${out.toSeq}")
    assert(out.forall(_._2 == "en"))
    assert(out.forall(_._3 >= 30L))
  }

  test("near-dup stage is optional and keeps the near-dup when disabled") {
    val out = Curation.curate(corpus, "doc_id", "text",
        Config(lang = "en", minTokens = 30L, minAlnumRatio = 0.5,
          nearDupJaccard = None))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(0L, 5L, 6L))
  }

  test("matches the stagewise composition on the real documents table") {
    import graft.operators.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Curation.curate(docs, "doc_id", "text", Config())
      .select($"doc_id").as[Long].collect().toSet

    // independent composition from the public single-stage operators
    val scored = docs
      .select($"doc_id", $"text", graft.functions.TextFunctions.tokenize($"text").as("_t"))
      .select($"doc_id", $"text",
        TextAnalysis.langIdFromTokens($"_t").as("lang"),
        size($"_t").cast("long").as("nt"),
        TextAnalysis.alnumRatio($"text").as("ar"))
      .filter($"lang" === "en" && $"nt" >= 30 && $"ar" >= 0.5)
    val keep = Dedup.exactKeepIds(scored.select($"doc_id", $"text"), "doc_id", "text")
    val ded = scored.join(keep, Seq("doc_id"), "left_semi")
    val drop = Dedup.minHashPairs(ded.select($"doc_id", $"text"), "doc_id", "text",
        minJaccard = 0.5)
      .select($"b_id".as("doc_id")).distinct()
    val expected = ded.join(drop, Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("p06's CSV settings round-trip text containing newlines and quotes") {
    // the generated corpus has no embedded newlines, but the round
    // trip must not depend on that (quoteAll on write + multiLine on
    // read is the pairing that makes it safe)
    val tricky = Seq(
      (1L, "line one\nline two", "en"),
      (2L, "a \"quoted\" phrase, with commas", "de"),
      (3L, "plain", "en")).toDF("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    tricky.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").option("compression", "gzip").csv(out)
    val back = spark.read.option("header", "true").option("multiLine", "true")
      .schema(tricky.schema).csv(out)
    assert(back.orderBy($"doc_id").collect().toSeq ===
      tricky.orderBy($"doc_id").collect().toSeq)
  }
}
