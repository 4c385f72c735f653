package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair graphs — the iterative/combinatorial
  * operators a curation pipeline runs on its OWN byproducts: the
  * near-duplicate pair graph (PageRank picks canonical representatives
  * and surfaces template hubs; triangles measure how clique-like a
  * duplicate cluster is) and source/host overlap graphs
  * (CommonCrawl-style host-centrality weighting). Complements
  * [[ConnectedComponents]], which answers "which cluster" — these
  * answer "how central inside it".
  *
  * Both operators are deterministic by construction so they sit under
  * the exact DuckDB oracle gate:
  *
  *  - PageRank runs in SCALED INTEGER arithmetic (rank mass is a
  *    `Long` in units of `scale^-1`). Integer sums are associative —
  *    no float summation-order drift between partitionings or engines
  *    — and `div` truncation is identical in Spark and DuckDB for the
  *    non-negative values here, so k iterations are bit-reproducible
  *    anywhere.
  *  - Triangle counting is exact combinatorics; the degree-ordered
  *    orientation changes the JOIN shape, never the answer.
  */
object Graphs {

  /** PageRank with a fixed iteration count over directed `edges`
    * (duplicate edges collapse; self-loops drop). Returns one row per
    * `vertices` row: `(idCol, rank)` with `rank: Long` in units of
    * `1/scale` — every vertex starts at `scale` and each iteration
    * applies `rank = base + damp * Σ in-contribs` with
    * `base = (dampDen-dampNum)*scale div dampDen` and each contrib
    * `rank div outdeg`. Vertices outside the edge set hold `base`.
    * Dangling mass is NOT redistributed (documented contract — it
    * keeps the update local so one iteration is one equi-join + one
    * sum, no global aggregate on the hot path).
    *
    * Scale shape: the edge list (joined once with out-degrees) and the
    * endpoint set are materialized ONCE with [[Checkpoints.materialize]]
    * (executor-local blocks by default; reliable shared-FS files when
    * `spark.graft.checkpointDir` is set); the k
    * iterations then chain k equi-join + partial-agg stages over those
    * cached blocks in a SINGLE job — no per-round driver action,
    * because the iteration count is fixed rather than
    * convergence-tested. All shuffles hash on vertex id. Caller picks
    * `scale` so that `nVertices * scale * dampNum` fits in a Long
    * (the default 1e9 is safe to ~10^8 vertices).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               vertices: DataFrame, idCol: String,
               iterations: Int = 5, scale: Long = 1000000000L,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(scale >= 1, s"scale=$scale must be positive")
    require(dampDen >= 1 && dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0, 1]")
    val base = (dampDen - dampNum) * scale / dampDen

    // Materialize the edge list FIRST: the degree join below reads it
    // twice, and without truncation each read re-executes the whole
    // upstream pair-generation (a shuffle-heavy self-join when the
    // edges come from near-dup mining).
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .transform(Checkpoints.materialize)
    // out-degree rides on every edge so an iteration never re-joins
    // the degree table; checkpointed once for all k iteration reads
    val ewd = e.join(e.groupBy(col("u")).agg(count(lit(1)).as("deg")), "u")
      .transform(Checkpoints.materialize)
    val verts = ewd.select(col("u")).union(ewd.select(col("v")))
      .distinct()
      .transform(Checkpoints.materialize)
    // ewd/verts carry everything the iterations read — e's blocks are
    // dead from here on (same explicit-free discipline as
    // ConnectedComponents: an operator must not park cached frames)
    unpersistOf(e)

    var ranks = verts.select(col("u"), lit(scale).as("r"))
    for (_ <- 1 to iterations) {
      val sums = ewd.join(ranks, "u")
        .select(col("v"), expr("r div deg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("m"))
      // lineage is LINEAR in k (each round reads the previous once),
      // so no per-round materialization is needed — the whole k-round
      // chain executes as one job when the caller acts
      ranks = verts.join(sums.withColumnRenamed("v", "u"), Seq("u"), "left")
        .select(col("u"),
          (lit(base) + expr(s"($dampNum * coalesce(m, 0L)) div $dampDen")).as("r"))
    }
    // ewd/verts blocks stay alive for the caller's action (checkpoint
    // lineage cannot recompute); the ContextCleaner frees them when
    // the result is dropped — same contract as ConnectedComponents'
    // final frame
    vertices.select(col(idCol))
      .join(ranks.withColumnRenamed("u", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("r"), lit(base)).as("rank"))
  }

  /** Per-vertex triangle counts over undirected `edges` (self-loops
    * and duplicate/reversed copies collapse). Returns `(vertex,
    * n_tri)` for every vertex on at least one triangle.
    *
    * Degree-ordered orientation: each undirected edge points from its
    * (degree, id)-smaller endpoint to the larger, so every wedge is
    * enumerated at its LOWEST-degree corner — candidate wedges are
    * Σ outdeg(v)² with outdeg ≤ O(√m), the classic bound that keeps a
    * power-law hub (degree 10⁶) from exploding into 10¹² wedge rows
    * the way a naive a<b<c id-ordered join does. Each triangle is
    * found exactly once; two hash equi-joins, both on vertex-id-shaped
    * keys, no cartesian anywhere.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // canonical undirected edge set — materialized: the degree and
    // orientation joins read it three times, and the upstream edge
    // producer (near-dup pair mining) must execute exactly once
    val und = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .transform(Checkpoints.materialize)
    val deg = und.select(col("u")).union(und.select(col("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("d"))
    // orient by (degree, id); carry the head's key so wedge pairs can
    // be ordered without re-joining degrees
    val ku = struct(col("du").as("d"), col("u").as("i"))
    val kv = struct(col("dv").as("d"), col("v").as("i"))
    val ord = und
      .join(deg.withColumnRenamed("u", "x").withColumnRenamed("d", "du"),
        col("u") === col("x"))
      .drop("x")
      .join(deg.withColumnRenamed("u", "y").withColumnRenamed("d", "dv"),
        col("v") === col("y"))
      .drop("y")
      .select(
        when(ku < kv, col("u")).otherwise(col("v")).as("s"),
        when(ku < kv, kv).otherwise(ku).as("tk"))
      .select(col("s"), col("tk.i").as("t"), col("tk"))
    // the oriented edge list is read three times (both wedge sides +
    // the closing join) — materialize it and free the canonical list
    val ordCk = ord.transform(Checkpoints.materialize)
    unpersistOf(und)
    // wedges at the low corner: unordered out-neighbor pairs, ordered
    // by the orientation key so the closing edge has a known direction
    val wedges = ordCk.select(col("s"), col("t").as("b"), col("tk").as("bk"))
      .join(ordCk.select(col("s"), col("t").as("c"), col("tk").as("ck")), "s")
      .filter(col("bk") < col("ck"))
      .select(col("s"), col("b"), col("c"))
    val tris = wedges
      .join(ordCk.select(col("t").as("c"), col("s").as("b")), Seq("b", "c"))
      .select(col("s"), col("b"), col("c"))
    // ordCk's blocks back the returned plan (truncated lineage); the
    // ContextCleaner frees them when the caller drops the result
    tris.select(explode(array(col("s"), col("b"), col("c"))).as("vertex"))
      .groupBy(col("vertex")).agg(count(lit(1)).as("n_tri"))
  }

  /** Multi-source BFS: minimum hop distance from the `seeds` set over
    * directed `edges`, bounded at `maxHops`. Returns `(idCol, hops)`
    * for every vertex reachable within the bound (seeds at 0) —
    * unreachable vertices are absent, so the output is the "blast
    * radius" of the seed set: exactly the shape a decontamination
    * pass needs when known-leaked documents must be expanded through
    * near-duplicate chains before dropping.
    *
    * Scale shape: the edge list is materialized ONCE (same
    * [[Checkpoints.materialize]] contract as [[pageRank]]); each of
    * the `maxHops` rounds is one equi-join on the source vertex + one
    * min-aggregate, all hashed on vertex id, and the round count is
    * fixed, so the whole chain executes as a SINGLE job with linear
    * lineage — no per-round driver action, no growing all-pairs
    * state. Distances are integers: min() is exact in any engine.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, idCol: String, maxHops: Int,
              edgeParts: Option[Int] = None): DataFrame = {
    require(maxHops >= 0, s"maxHops=$maxHops must be >= 0")
    // edgeParts pins the dedup exchange for a FACT-SCALE edge list
    // (the r10 sf20 ladder: AQE sized the distinct from compressed
    // map bytes, packed ~10x that in-memory state per task, and the
    // sort-based fallback spilled 33.7 GB). Partitioning on u alone
    // satisfies the distinct's (u, v) clustering AND pre-buckets the
    // edge list on the iteration rounds' join key, so the rounds
    // reuse the same layout. Callers derive it from the edge-source
    // row count (DerivedCaps.factPartsFor); None keeps AQE sizing for
    // dimension-scale graphs.
    val slim = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
    val e = edgeParts.fold(slim)(p => slim.repartition(p, col("u")))
      .distinct()
      .transform(Checkpoints.materialize)
    var dist = seeds.select(col(idCol).cast("long").as("u")).distinct()
      .select(col("u"), lit(0L).as("h"))
    for (_ <- 1 to maxHops) {
      val next = e.join(dist, "u")
        .select(col("v").as("u"), (col("h") + 1L).as("h"))
      dist = dist.union(next).groupBy(col("u")).agg(min(col("h")).as("h"))
    }
    // e's blocks back the returned plan; the ContextCleaner frees them
    // when the caller drops the result (pageRank's contract)
    dist.select(col("u").as(idCol), col("h").as("hops"))
  }

  /** Common-neighbor link prediction over a bipartite edge list
    * `(srcCol, dstCol)`: for every pair of src vertices sharing at
    * least `minCommon` dst neighbors, the shared-neighbor count — the
    * classic "who should be linked but isn't" score (suppliers with
    * overlapping catalogs, documents citing the same sources, users
    * touching the same items).
    *
    * Scale shape: candidate pairs are mined by self-joining the edge
    * list on the CENTER (dst) vertex, so the blowup is Σ deg(dst)² —
    * `maxDegree` drops hub centers first (a center shared by everyone
    * predicts nothing, exactly like d03's boilerplate-shingle cap),
    * making the wedge volume an explicit budget. The pair aggregate
    * collapses wedges to one row per (a, b); `minCommon` prunes the
    * long singleton tail before the final exchange. Two hash
    * equi-joins + one aggregate, no cartesian anywhere. */
  def commonNeighbors(edges: DataFrame, srcCol: String, dstCol: String,
                      maxDegree: Option[Long] = None,
                      minCommon: Long = 2L,
                      edgeParts: Option[Int] = None): DataFrame =
    commonNeighborPairs(
      centeredEdges(edges, srcCol, dstCol, maxDegree, edgeParts), minCommon)

  /** Deduped, hub-capped `(_s, _c)` edge list — the shared prep for
    * the neighbor-overlap family. `edgeParts` pins the dedup exchange
    * for fact-scale edge sources (same AQE in-memory-state blind spot
    * as [[bfsHops]]); partitioning on the CENTER column also
    * pre-buckets the list for the wedge self-join and the degree cap,
    * which cluster on `_c`. */
  private def centeredEdges(edges: DataFrame, srcCol: String,
                            dstCol: String,
                            maxDegree: Option[Long],
                            edgeParts: Option[Int] = None): DataFrame = {
    val slim = edges.select(col(srcCol).cast("long").as("_s"),
        col(dstCol).cast("long").as("_c"))
      .filter(col("_s").isNotNull && col("_c").isNotNull)
    val e = edgeParts.fold(slim)(p => slim.repartition(p, col("_c")))
      .distinct()
    maxDegree match {
      case Some(cap) =>
        val keep = e.groupBy(col("_c")).agg(count(lit(1)).as("_d"))
          .filter(col("_d") <= cap).select(col("_c"))
        e.join(keep, Seq("_c"))
      case None => e
    }
  }

  private def commonNeighborPairs(centered: DataFrame,
                                  minCommon: Long): DataFrame =
    centered.select(col("_c"), col("_s").as("a"))
      .join(centered.select(col("_c"), col("_s").as("b")), Seq("_c"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)

  /** [[commonNeighbors]] normalized to the Jaccard of the two
    * neighbor SETS, in exact basis points: `⌊10000·|A∩B| /
    * |A∪B|⌋` with `|A∪B| = deg(a) + deg(b) − |A∩B|`. Degrees are
    * measured on the SAME capped edge list the pairs are mined from,
    * so the score is internally consistent. Integer arithmetic end to
    * end → bit-reproducible across engines. Adds only two hashed
    * joins against the src-degree aggregate (vertex-sized, broadcast
    * at scale); the wedge shuffle stays the budgeted cost. */
  def jaccardNeighbors(edges: DataFrame, srcCol: String, dstCol: String,
                       maxDegree: Option[Long] = None,
                       minCommon: Long = 2L,
                       edgeParts: Option[Int] = None): DataFrame = {
    val centered = centeredEdges(edges, srcCol, dstCol, maxDegree, edgeParts)
    val deg = centered.groupBy(col("_s")).agg(count(lit(1)).as("_d"))
    commonNeighborPairs(centered, minCommon)
      .join(deg.select(col("_s").as("a"), col("_d").as("_da")), Seq("a"))
      .join(deg.select(col("_s").as("b"), col("_d").as("_db")), Seq("b"))
      .select(col("a"), col("b"), col("n_common"),
        expr("(n_common * 10000) div (_da + _db - n_common)")
          .as("jaccard_bp"))
  }

  /** HITS hubs-and-authorities with a fixed iteration count over
    * directed `edges`, in UNNORMALIZED integer arithmetic. Starting
    * from `hub₀ = 1` on every endpoint, iteration i computes
    * `auth_i(v) = Σ_{u→v} hub_{i−1}(u)` then
    * `hub_i(u) = Σ_{u→v} auth_i(v)` — k applications of the classic
    * mutual-reinforcement update. The textbook per-step normalization
    * is a GLOBAL scalar divide, so dropping it rescales every score
    * by the same constant per step: rankings and score RATIOS are
    * identical to the normalized fixed-k iterate, while the arithmetic
    * stays in exact integers (associative sums, no float drift, no
    * global max/sum aggregate on the hot path — the same properties
    * that put [[pageRank]] under the exact DuckDB oracle).
    *
    * Returns one row per `vertices` row: `(idCol, auth, hub)` — auth
    * from the final half-step, hub closed against it; vertices outside
    * the edge set score 0. Overflow bound: scores grow by a factor
    * ≤ max-degree² per iteration (‖A‖₁·‖Aᵀ‖₁), so k iterations need
    * `log₂(m · dmax^(2k−1)) < 63` — with the default k=3 that holds to
    * degree ~10³ on a 10⁹-edge graph; hub-capped near-dup pair graphs
    * (the intended input, capped like d03's shingle df cap) sit far
    * under it. `require` documents the k bound rather than silently
    * wrapping.
    *
    * Scale shape: the deduped edge list is materialized ONCE and every
    * update is an equi-join + partial-agg hash-shuffled on vertex id —
    * 2k stages chained in a single job, no per-round driver action,
    * the same iteration discipline as [[pageRank]]. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           vertices: DataFrame, idCol: String,
           iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 6,
      s"iterations=$iterations out of [1, 6]: unnormalized scores grow " +
        "~dmax^2 per iteration and must stay in a Long")
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .transform(Checkpoints.materialize)
    var hub = e.select(col("u")).union(e.select(col("v"))).distinct()
      .select(col("u"), lit(1L).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      auth = e.join(hub, "u")
        .groupBy(col("v")).agg(sum(col("h")).as("a"))
      hub = e.join(auth.withColumnRenamed("v", "w"), col("v") === col("w"))
        .groupBy(col("u")).agg(sum(col("a")).as("h"))
    }
    // e's blocks back the returned plan; the ContextCleaner frees them
    // when the caller drops the result (pageRank's contract)
    vertices.select(col(idCol))
      .join(auth.withColumnRenamed("v", idCol), Seq(idCol), "left")
      .join(hub.withColumnRenamed("u", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("a"), lit(0L)).as("auth"),
        coalesce(col("h"), lit(0L)).as("hub"))
  }

  /** Fixed-round k-core peeling over undirected `edges`: each round
    * drops every vertex with degree < `k` and every edge touching
    * one, the standard iterative reduction to the maximal subgraph of
    * minimum degree ≥ k. The dedup use: a duplicate CLUSTER (connected
    * component) can be a star of partial copies or a clique of full
    * mirrors — the 2-core strips the star fringe, and what survives
    * is the densely mirrored center worth human review. A FIXED round
    * count (not convergence-tested) keeps the whole computation one
    * declarative job — k rounds of (degree agg + two vertex-keyed
    * semi-joins), every shuffle on vertex id, edge list materialized
    * per round so lineage stays flat — and puts the operator under an
    * exact unrolled-CTE oracle, the same contract as [[pageRank]].
    * Returns `(vertex, deg)` for the endpoints of surviving edges with
    * their degree in the peeled subgraph. Rounds needed to CONVERGE is
    * graph-dependent (a path peels one layer per round); callers
    * wanting the true k-core loop until the edge count stops moving. */
  def kCorePeel(edges: DataFrame, aCol: String, bCol: String,
                k: Long = 2L, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1 && rounds <= 8, s"rounds=$rounds out of [1, 8]")
    var e = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .transform(Checkpoints.materialize)
    for (_ <- 1 to rounds) {
      val deg = e.select(col("u")).union(e.select(col("v")))
        .groupBy(col("u")).agg(count(lit(1)).as("_d"))
      val keep = deg.filter(col("_d") >= k).select(col("u"))
      val prev = e
      e = e.join(keep, "u")
        .join(keep.withColumnRenamed("u", "v"), "v")
        .select(col("u"), col("v"))
        .transform(Checkpoints.materialize)
      unpersistOf(prev)
    }
    e.select(col("u")).union(e.select(col("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .select(col("u").as("vertex"), col("deg"))
  }

  /** Newman modularity of an EXTERNALLY-GIVEN partition against an
    * undirected edge list — per partition block c:
    * `contrib_c = m_c/m − (deg_c/2m)²`, so `Q = Σ_c contrib_c`
    * measures whether edges concentrate inside blocks (Q→1) or ignore
    * them (Q≈0). The curation use: `membership` = document metadata
    * (source, language, snapshot) and `edges` = the mined near-dup
    * pair graph — "is duplication a within-source phenomenon or a
    * cross-source one?" — which decides whether dedup can run
    * per-source (cheap, parallel) or must be global.
    *
    * Exactness: m, m_c, deg_c are exact integer aggregates; the one
    * float step `(4m·m_c − deg_c²) / 4m²` applies identical IEEE ops
    * to identical integer-valued operands in any engine, so even the
    * rounded contribution is bit-reproducible. Returns one row per
    * membership block: `(partCol, intra_edges, deg_sum, q_contrib)`,
    * blocks with no graph presence at 0. Scale shape: the edge list
    * is materialized once (read for m, degrees, and both endpoint
    * joins); everything else is vertex-keyed equi-joins + partial
    * aggs, with the 1-row edge total broadcast. Vertices missing from
    * `membership` count toward m via their edges but toward no block —
    * give membership full coverage for Σ contrib to be Q exactly. */
  def partitionModularity(edges: DataFrame, aCol: String, bCol: String,
                          membership: DataFrame, idCol: String,
                          partCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .transform(Checkpoints.materialize)
    val mem = membership.select(col(idCol).cast("long").as("u"),
      col(partCol).as("_p"))
    val mTot = und.agg(count(lit(1)).as("_m"))
    val deg = und.select(col("u")).union(und.select(col("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("_dg"))
    val intra = und
      .join(mem.select(col("u"), col("_p").as("_pa")), "u")
      .join(mem.select(col("u").as("v"), col("_p").as("_pb")), "v")
      .filter(col("_pa") === col("_pb"))
      .groupBy(col("_pa").as("_p")).agg(count(lit(1)).as("_mc"))
    val degSum = mem.join(deg, Seq("u"), "left")
      .groupBy(col("_p")).agg(sum(coalesce(col("_dg"), lit(0L))).as("_dc"))
    degSum.join(intra, Seq("_p"), "left").crossJoin(broadcast(mTot))
      .select(col("_p").as(partCol),
        coalesce(col("_mc"), lit(0L)).as("intra_edges"),
        col("_dc").as("deg_sum"),
        round((lit(4.0) * col("_m") * coalesce(col("_mc"), lit(0L))
            - col("_dc") * col("_dc"))
          / (lit(4.0) * col("_m") * col("_m")), 6).as("q_contrib"))
  }

  private def unpersistOf(df: DataFrame): Unit = Checkpoints.free(df)
}
