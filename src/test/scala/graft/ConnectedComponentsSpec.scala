package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], vertices: Seq[Long],
                  maxIter: Int = 50): Map[Long, Long] =
    ConnectedComponents.components(
        edges.toDF("a", "b"), "a", "b", vertices.toDF("id"), "id", maxIter)
      .as[(Long, Long)].collect().toMap

  /** Union-find oracle. */
  private def brute(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vertices.map(v => v -> find(v)).toMap
  }

  test("chains, cycles, singletons") {
    val vertices = (1L to 9L).toSeq
    // chain 1-2-3-4, triangle 5-6-7 (cycle), edge 8-8 (self), 9 isolated
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 6L), (6L, 7L),
      (7L, 5L), (8L, 8L))
    val got = run(edges, vertices)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L))
  }

  test("long path converges to one component (diameter rounds)") {
    val n = 24L
    val vertices = (1L to n).toSeq
    val edges = (1L until n).map(i => (i, i + 1))
    val got = run(edges, vertices)
    assert(got.values.toSet == Set(1L), s"path did not fully converge: $got")
  }

  test("random graph matches the union-find oracle") {
    var x = 7L
    def nxt(m: Long): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L; math.floorMod(x, m)
    }
    val vertices = (0L until 120L).toSeq
    val edges = Seq.fill(90)((nxt(120), nxt(120)))
    assert(run(edges, vertices) == brute(edges, vertices))
  }

  // r15: the symmetrization is a map-side explode over ONE read of the
  // edge subtree and the dedup exchange can be width-pinned (edgeParts,
  // the d13 sf160 spill fix). Pin both properties: pinned and unpinned
  // agree with the oracle on a graph with duplicate, reversed and
  // self-loop edges (the explode must reproduce union semantics
  // exactly), and the pinned width really reaches the exchange.
  test("edgeParts pin preserves semantics on duplicate/reversed/self-loop edges") {
    val vertices = (1L to 10L).toSeq
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (4L, 5L),
      (5L, 6L), (6L, 4L), (7L, 8L))
    val expected = brute(edges, vertices)
    assert(run(edges, vertices) == expected, "unpinned explode shape")
    val pinned = ConnectedComponents.components(
        edges.toDF("a", "b"), "a", "b", vertices.toDF("id"), "id",
        edgeParts = Some(7))
      .as[(Long, Long)].collect().toMap
    assert(pinned == expected, "edgeParts-pinned shape")
  }

  test("pinned symmetrized-edge exchange runs at the requested width") {
    // capture the materialized sym frame via the Checkpoints fault hook
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    graft.operators.Checkpoints.faultHook.set { df =>
      seen += df.rdd.getNumPartitions
    }
    try {
      ConnectedComponents.components(
          Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b",
          Seq(1L, 2L, 3L).toDF("id"), "id", edgeParts = Some(7))
        .count()
    } finally graft.operators.Checkpoints.faultHook.set((_: org.apache.spark.sql.DataFrame) => ())
    // the FIRST materialization is the symmetrized edge list: the
    // REPARTITION_BY_NUM width must survive to its stored blocks
    // (AQE's coalescer skips that origin)
    assert(seen.head == 7, s"sym width ${seen.head} != pinned 7 (all: $seen)")
  }

  private def runStar(edges: Seq[(Long, Long)], vertices: Seq[Long],
                      maxIter: Int = 50): (Map[Long, Long], Int) = {
    val (df, rounds) = ConnectedComponents.componentsStarWithRounds(
      edges.toDF("a", "b"), "a", "b", vertices.toDF("id"), "id", maxIter)
    (df.as[(Long, Long)].collect().toMap, rounds)
  }

  test("star contraction agrees with min-label and union-find on varied graphs") {
    val fixtures = Seq(
      // chain + cycle + self-loop + isolated
      ((1L to 9L).toSeq, Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 6L),
        (6L, 7L), (7L, 5L), (8L, 8L))),
      // empty graph
      ((1L to 4L).toSeq, Seq.empty[(Long, Long)]),
      // two merged stars
      ((0L to 10L).toSeq, Seq((0L, 5L), (1L, 5L), (2L, 5L), (6L, 10L),
        (7L, 10L), (5L, 10L)))
    )
    fixtures.foreach { case (vs, es) =>
      val (got, _) = runStar(es, vs)
      assert(got === brute(es, vs), s"fixture $es")
      assert(got === run(es, vs))
    }
    // random graphs vs union-find
    var x = 3L
    def nxt(m: Long): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L; math.floorMod(x, m)
    }
    (1 to 5).foreach { _ =>
      val vs = (0L until 80L).toSeq
      val es = Seq.fill(60)((nxt(80), nxt(80)))
      assert(runStar(es, vs)._1 === brute(es, vs))
    }
  }

  test("star contraction converges logarithmically on a long path") {
    // a 600-node path has diameter 599: min-label needs ~599 rounds
    // (it would NOT converge inside maxIter = 50), star contraction
    // collapses it in O(log n) alternations
    val n = 600L
    val vertices = (1L to n).toSeq
    val edges = (1L until n).map(i => (i, i + 1))
    val (got, rounds) = runStar(edges, vertices, maxIter = 50)
    assert(got.values.toSet === Set(1L), s"path did not converge: $rounds rounds")
    assert(rounds <= 15, s"star contraction took $rounds rounds on a ${n}-path")
  }

  test("leaves no persisted blocks behind (localCheckpoint is bounded)") {
    // localCheckpoint truncates lineage with executor-stored blocks;
    // ContextCleaner reclaims them once unreferenced — but the
    // operator must not PIN anything in the persistence ledger after
    // its result is materialized and the frame dropped
    val before = spark.sparkContext.getPersistentRDDs.size
    val vertices = (1L to 40L).toSeq
    val edges = (1L until 40L).map(i => (i, i + 1))
    run(edges, vertices, maxIter = 50)
    // the operator frees every intermediate round explicitly (a
    // 40-path converges in ~39 rounds — that would be ~40 leaked
    // frames); only the FINAL labels frame may stay pinned until the
    // caller's result is collected and the cleaner runs
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }
}
