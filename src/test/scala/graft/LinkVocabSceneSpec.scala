package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.{Graphs, TextAnalysis}

/** Unit gates for the round-7 additions: common-neighbor link
  * prediction, vocabulary-growth curve, MJPEG scene-change detection. */
class LinkVocabSceneSpec extends SparkSpec {
  import spark.implicits._

  test("commonNeighbors counts shared centers, a<b, minCommon prunes") {
    // suppliers 1,2 share parts 10,11; 1,3 share only part 10
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L),
      (2L, 10L)) // duplicate edge must not double-count
      .toDF("supp", "part")
    val out = Graphs.commonNeighbors(e, "supp", "part", minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 2L)))
  }

  test("commonNeighbors: maxDegree drops hub centers before pairing") {
    // center 99 is shared by everyone — capped out, so no pairs survive
    val e = (1L to 10L).map(s => (s, 99L)).toDF("supp", "part")
    val capped = Graphs.commonNeighbors(e, "supp", "part",
      maxDegree = Some(5L), minCommon = 1L)
    assert(capped.count() == 0)
    val uncapped = Graphs.commonNeighbors(e, "supp", "part", minCommon = 1L)
    assert(uncapped.count() == 45) // C(10,2): the blowup the cap prevents
  }

  test("vocabGrowth: cumulative types and tokens match brute force") {
    val docsDf = Seq(
      (0L, "a b a"), (1L, "b c"),   // bucket 0: types a,b,c toks 5
      (2L, "c d"), (3L, "a d e")    // bucket 1: new d,e toks 5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docsDf, "doc_id", "text", bucketDocs = 2L)
      .orderBy($"n_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((2L, 3L, 5L), (4L, 5L, 10L)))
  }

  test("vocabGrowth: bucket with zero new types keeps the cumulative count") {
    val docsDf = Seq((0L, "x y"), (1L, "y x"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docsDf, "doc_id", "text", bucketDocs = 1L)
      .orderBy($"n_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 2L), (2L, 2L, 4L), (3L, 2L, 5L)))
  }

  test("sceneChanges: wrap cuts match the closed form on real decode") {
    // ids straddling the 255 wrap within their frame count, plus a
    // no-cut control
    val ids = Seq(254L, 255L, 250L, 7L)
    val ds = ids.toDS().map(id => (id, Multimodal.synthMjpeg(id)))
    val got = Multimodal.sceneChanges(ds, threshold = 32.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    ids.foreach { id =>
      val n = (1 + id % 12).toInt
      val cuts = (1 until n).count(j => (id + j) % 256 == 0)
      assert(got(id) == (n.toLong, cuts.toLong), s"id=$id")
    }
    assert(got(254L)._2 == 1L && got(7L)._2 == 0L) // the fixture really cuts
  }

  test("kAnonymize: small groups suppressed, group_size carried, k=1 keeps all") {
    val df = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "fr", "web"), (5L, "de", "book")
    ).toDF("id", "lang", "source")
    val k3 = graft.operators.Curation.kAnonymize(df, Seq("lang", "source"), 3L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(k3 == Set((1L, 3L), (2L, 3L), (3L, 3L)))
    assert(graft.operators.Curation.kAnonymize(df, Seq("lang", "source"), 1L)
      .count() == 5)
  }

  test("s08 PQ codes: in-range, pack arithmetic holds, partition-invariant") {
    val q = SparkEntry.queries("s08_pq_codes")(spark, sfDir)
    val rows = q.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val Seq(code, c0, c1, c2, c3) = (1 to 5).map(r.getLong)
      assert(Seq(c0, c1, c2, c3).forall(c => c >= 0 && c < 8))
      assert(code == c0 * 512 + c1 * 64 + c2 * 8 + c3)
    }
    assert(rows.map(_.getLong(1)).distinct.length > 1,
      "all vectors landed in one PQ cell — codebooks degenerate")
  }

  test("sceneChanges: undecodable or resized frames count as cuts") {
    // two real JPEG frames with DIFFERENT dims -> dimension change = cut
    val f1 = Multimodal.ImageCodec.encode(16, 12, (x, y) => (x * 16) << 16, "jpg")
    val f2 = Multimodal.ImageCodec.encode(8, 8, (x, y) => (y * 31) << 8, "jpg")
    val ds = Seq((1L, f1 ++ f2)).toDS()
    val out = Multimodal.sceneChanges(ds, threshold = 32.0).collect().head
    assert(out.getLong(1) == 2L && out.getLong(2) == 1L)
  }
}
