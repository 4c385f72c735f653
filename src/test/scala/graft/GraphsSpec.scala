package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graphs

/** Graph analytics: PageRank against a driver-side integer reference
  * implementation (the operator's arithmetic contract is exact, so the
  * comparison is equality, not tolerance), triangle counts against
  * brute-force 3-subset enumeration, and the robustness edges —
  * duplicate/reversed/self-loop edges, isolated vertices, and
  * partitioning invariance. */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L
  private val Base = 150000000L

  /** Driver-side twin of Graphs.pageRank's scaled-integer update. */
  private def refPageRank(edges: Seq[(Long, Long)], verts: Seq[Long],
                          iters: Int): Map[Long, Long] = {
    val e = edges.filter { case (u, v) => u != v }.distinct
    val outDeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val graphVerts = (e.map(_._1) ++ e.map(_._2)).distinct
    var r = graphVerts.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outDeg(u) }.sum).toMap
      r = graphVerts.map(v => v -> (Base + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    verts.map(v => v -> r.getOrElse(v, Base)).toMap
  }

  private def runPageRank(edges: Seq[(Long, Long)], verts: Seq[Long],
                          iters: Int = 5): Map[Long, Long] = {
    val e = edges.toDF("src", "dst")
    val v = verts.toDF("id")
    Graphs.pageRank(e, "src", "dst", v, "id", iterations = iters)
      .as[(Long, Long)].collect().toMap
  }

  test("pageRank matches the integer reference on a directed star + chain") {
    // hub 1 receives from 2,3,4; chain 5→6→7; isolated 9
    val edges = Seq[(Long, Long)]((2, 1), (3, 1), (4, 1), (1, 2), (5, 6), (6, 7))
    val verts = Seq[Long](1, 2, 3, 4, 5, 6, 7, 9)
    val got = runPageRank(edges, verts)
    assert(got === refPageRank(edges, verts, 5))
    // the hub out-ranks its spokes; the isolated vertex holds base mass
    assert(got(1L) > got(3L))
    assert(got(9L) === Base)
  }

  test("pageRank collapses duplicate edges and drops self-loops") {
    val noisy = Seq[(Long, Long)]((1, 2), (1, 2), (1, 2), (2, 2), (2, 1))
    val clean = Seq[(Long, Long)]((1, 2), (2, 1))
    val verts = Seq[Long](1, 2, 3)
    assert(runPageRank(noisy, verts) === runPageRank(clean, verts))
  }

  test("pageRank is partitioning-invariant and matches the reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val verts = (0L until n.toLong).toSeq
    val expected = refPageRank(edges, verts, 5)
    assert(runPageRank(edges, verts) === expected)
    // repartitioned input — integer sums cannot drift with order
    val e13 = edges.toDF("src", "dst").repartition(13)
    val got = Graphs.pageRank(e13, "src", "dst", verts.toDF("id"), "id")
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("pageRank conserves bounded mass (sanity on totals)") {
    // with no dangling redistribution total mass only leaks DOWN, and
    // every rank sits in [base, n*scale]
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (4, 1))
    val verts = Seq[Long](1, 2, 3, 4)
    val got = runPageRank(edges, verts)
    assert(got.values.forall(r => r >= Base && r <= 4 * Scale))
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Brute force: count 3-cliques over the canonical undirected set. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }.toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      a = vs(i); b = vs(j); c = vs(k)
      if und((a, b)) && und((a, c)) && und((b, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("triangleCounts: K4 gives every vertex 3 triangles; C5 gives none") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(runTriangles(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val c5 = Seq[(Long, Long)]((0, 1), (1, 2), (2, 3), (3, 4), (4, 0))
    assert(runTriangles(c5) === Map.empty)
  }

  test("triangleCounts ignores edge direction, duplicates, and self-loops") {
    val messy = Seq[(Long, Long)]((1, 2), (2, 1), (2, 3), (3, 2), (1, 3),
      (1, 1), (1, 2), (3, 3))
    assert(runTriangles(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts matches brute force on random graphs (incl. skewed hub)") {
    val rnd = new scala.util.Random(11)
    // skewed: vertex 0 connects to everyone (the power-law hub shape
    // the degree orientation exists for) + random background edges
    val hub = (1L to 30L).map(v => (0L, v))
    val bg = Seq.fill(120)((rnd.nextInt(31).toLong, rnd.nextInt(31).toLong))
    val edges = hub ++ bg
    assert(runTriangles(edges) === refTriangles(edges))
    val sparse = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    assert(runTriangles(sparse) === refTriangles(sparse))
  }

  /** Driver-side BFS twin (directed, min-hop, bounded). */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     maxHops: Int): Map[Long, Long] = {
    val adj = edges.filter { case (u, v) => u != v }.distinct.groupBy(_._1)
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(u => adj.getOrElse(u, Nil).map(_._2))
        .distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  private def runBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     maxHops: Int): Map[Long, Long] = {
    Graphs.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("id"), "id", maxHops)
      .as[(Long, Long)].collect().toMap
  }

  test("bfsHops: path graph distances, hop bound, and direction respected") {
    val path = Seq[(Long, Long)]((0, 1), (1, 2), (2, 3), (3, 4), (4, 5))
    assert(runBfs(path, Seq(0L), 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // directed: nothing upstream of the seed is reached
    assert(runBfs(path, Seq(3L), 5) === Map(3L -> 0L, 4L -> 1L, 5L -> 2L))
    // maxHops=0 returns just the seeds
    assert(runBfs(path, Seq(2L), 0) === Map(2L -> 0L))
  }

  test("bfsHops: multi-source min semantics and messy edges match brute force") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val seeds = Seq(0L, 7L, 7L, 13L) // dup seed collapses
    for (k <- 0 to 4)
      assert(runBfs(edges, seeds, k) === refBfs(edges, seeds, k), s"maxHops=$k")
  }
}
