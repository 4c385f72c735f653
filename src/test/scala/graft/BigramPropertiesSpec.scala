package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Bigrams
import graft.functions.TextFunctions._

/** Property-based invariants from SURVEY.md §5.3 over arbitrary
  * corpora: conservation of counts, key alphabet, mode ordering.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest bridge
  * artifact isn't available offline.) */
class BigramPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val recordGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("Zuñi", "a_b", "x!!y", "...", "многа", "42", "_", "parched")))
    seps <- Gen.listOfN(n + 1, Gen.oneOf(" ", "  ", "\t", ", ", "; "))
  } yield seps.zipAll(toks, " ", "").flatMap { case (s, t) => Seq(s, t) }.mkString

  private def corpora(size: Int, rounds: Int): Seq[List[String]] =
    (0 until rounds).map { i =>
      Gen.listOfN(size, recordGen)
        .pureApply(Gen.Parameters.default, Seed(42L + i))
    }

  test("Σ counts = Σ max(0, tokens(record) − 1) over records") {
    for (records <- corpora(25, 15)) {
      val df = records.toDF("value")
      val expected = df.select(greatest(size(tokenize($"value")) - 1, lit(0)).as("c"))
        .agg(sum($"c")).as[Option[Long]].head().getOrElse(0L)
      val total = Bigrams.counts(df).agg(coalesce(sum($"count"), lit(0L)))
        .as[Long].head()
      assert(total == expected, s"corpus=$records")
    }
  }

  test("key alphabet ⊆ [a-z0-9+], every count ≥ 1, token halves non-empty") {
    for (records <- corpora(25, 15)) {
      val rows = Bigrams.counts(records.toDF("value")).as[(String, Long)].collect()
      rows.foreach { case (k, c) =>
        assert(c >= 1)
        assert(k.matches("[a-z0-9]+\\+[a-z0-9]+"), s"bad key '$k' in $records")
      }
    }
  }

  test("line-mode counts ≤ whole-file-mode counts key-wise") {
    for (records <- corpora(12, 10)) {
      val text = records.mkString("\n")
      val asLines = Bigrams.counts(text.split("\n").toSeq.toDF("value"))
        .as[(String, Long)].collect().toMap
      val asFile = Bigrams.counts(Seq(text).toDF("value"))
        .as[(String, Long)].collect().toMap
      asLines.foreach { case (k, c) =>
        assert(asFile.getOrElse(k, 0L) >= c, s"key $k: line=$c file=${asFile.get(k)}")
      }
    }
  }
}
