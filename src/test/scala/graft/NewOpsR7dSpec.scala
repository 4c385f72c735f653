package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Round-7 additions part d: code-vs-prose detection (t22),
  * curriculum ordering (x25), and partition modularity (g07). */
class NewOpsR7dSpec extends SparkSpec {
  import spark.implicits._

  test("partitionModularity matches hand-computed Newman contributions") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("a", "b")
    val mem = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "C")).toDF("id", "part")
    val got = Graphs.partitionModularity(edges, "a", "b", mem, "id", "part")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // m=4; A: triangle (mc=3, dc=6) -> (48-36)/64; B: one edge (mc=1,
    // dc=2) -> (16-4)/64; C: isolated -> 0
    assert(got("A") == ((3L, 6L, 0.1875)))
    assert(got("B") == ((1L, 2L, 0.1875)))
    assert(got("C") == ((0L, 0L, 0.0)))
  }

  test("g07 invariants on sf0.001: degree sums and edge counts reconcile") {
    val rows = SparkEntry.queries("g07_source_modularity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val m = graft.operators.Dedup.ngramJaccardPairs(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text",
      n = 3, minJaccard = 0.5, maxDf = 1000).count()
    assert(m > 0, "fixture must contain organic near-dup pairs")
    // every endpoint has a source, so Σ deg = 2m and Σ intra ≤ m
    assert(rows.map(_.getLong(2)).sum == 2 * m)
    assert(rows.map(_.getLong(1)).sum <= m)
    // Q is a sum of per-source contributions in [-1, 1]
    val q = rows.map(_.getDouble(3)).sum
    assert(q >= -1.0 - 1e-9 && q <= 1.0 + 1e-9, s"Q=$q")
  }

  test("t22 flags exactly the planted code docs at sf0.001") {
    val rows = SparkEntry.queries("t22_code_detect")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val flagged = r.getAs[Long]("is_code") == 1L
      if (id % 13 == 0) assert(flagged, s"doc $id: planted code not flagged")
      else assert(!flagged,
        s"doc $id: prose misflagged (${r.getAs[Long]("punct_permille")} permille)")
      assert(r.getAs[Long]("punct_permille") ==
        r.getAs[Long]("code_punct") * 1000 / r.getAs[Long]("n_chars"))
    }
  }

  test("x25: pos is the permutation of the (level, md5 coin, id) sort") {
    val rows = SparkEntry.queries("x25_curriculum")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("level"),
        r.getAs[Long]("pos")))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong).toSeq)
    def coin(id: Long): String = {
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$id:cur42".getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    val expected = rows.sortBy(r => (r._2, coin(r._1), r._1))
      .zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    rows.foreach { case (id, _, pos) =>
      assert(pos == expected(id), s"doc $id")
    }
    // levels are visited in order: positions within a level form a
    // contiguous range below every higher level's positions
    val byLevel = rows.groupBy(_._2).toSeq.sortBy(_._1)
    byLevel.sliding(2).foreach {
      case Seq((_, lo), (_, hi)) =>
        assert(lo.map(_._3).max < hi.map(_._3).min)
      case _ =>
    }
  }
}
