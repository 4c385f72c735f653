package graft

import scala.math.BigDecimal.RoundingMode

import graft.operators.{Dedup, TextAnalysis}

/** Brute-force parity for the round-7 operators, on corpora built to
  * collide: tiny vocabulary, many shared windows, every doc-length
  * edge case. The distributed plans must equal a 20-line sequential
  * reference exactly. */
class NewOpParitySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random corpus over a 3-token vocabulary. */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val vocab = Array("aa", "bb", "cc")
    (0 until nDocs).map { i =>
      var z = seed * 1000003L + i * 37L
      def next(): Int = { z = z * 6364136223846793005L + 1442695040888963407L; ((z >>> 33) % 16).toInt }
      val len = next()
      (i.toLong, Seq.fill(len)(vocab(next() % 3)).mkString(" "))
    }
  }

  test("dupSpans equals the sequential reference on colliding corpora") {
    for (seed <- 1L to 4L) {
      val docs = corpus(seed, 40)
      val w = 3
      // sequential reference
      val windows = docs.map { case (id, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        id -> t.sliding(w).filter(_.length == w).map(_.mkString(" ")).toSeq
      }
      val global = windows.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val expect = windows.map { case (id, ws) =>
        id -> ((ws.size.toLong, ws.count(global(_) > 1).toLong))
      }.toMap
      val got = Dedup.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expect, s"seed $seed:\n got   $got\n want $expect")
    }
  }

  test("bm25TopK equals the sequential scorer, ranks and rounded scores") {
    for (seed <- 1L to 3L) {
      val docs = corpus(seed + 10, 30)
      val terms = Seq("aa", "cc")
      val (k1, b) = (1.2, 0.75)
      val toks = docs.map { case (id, text) =>
        id -> text.split("\\s+").filter(_.nonEmpty).toSeq
      }
      val n = toks.size.toLong
      val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n.toDouble
      val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
      val expect = toks.flatMap { case (id, ts) =>
        val scores = terms.flatMap { term =>
          val tf = ts.count(_ == term).toLong
          if (tf == 0) None
          else Some((((n - df(term)) + 0.5) / (df(term) + 0.5)) *
            ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (ts.size.toLong / avgdl)))))
        }
        if (scores.isEmpty) None
        else Some((id, scores.size.toLong,
          BigDecimal(scores.sorted.foldLeft(0.0)(_ + _))
            .setScale(4, RoundingMode.HALF_UP).toDouble))
      }.sortBy { case (id, _, s) => (-s, id) }.take(10)
      val got = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"),
          "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expect, s"seed $seed:\n got   $got\n want $expect")
    }
  }
}
