package graft

/** Round-7 query additions: distribution-rank windows (q32), blocked
  * fuzzy matching (t18), and the ORC interchange round trip (p07).
  * Each gets a semantic check independent of the DuckDB oracle, plus
  * the plan property that carries its 100 TB claim. */
class NewQueriesR7Spec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("q32 rank fractions are the closed-form rationals of (rank, n)") {
    val rows = SparkEntry.queries("q32_window_dist")(spark, sfDir)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), min($"pct_rank").as("lo"), max($"pct_rank").as("hi"),
        min($"cum_dist").as("clo"), max($"cum_dist").as("chi"),
        countDistinct($"quartile").as("nq"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      // orderkey tiebreak → every row its own peer group: pct_rank
      // spans exactly [0, 1], cume_dist spans (1/n, 1]
      assert(r.getAs[Double]("lo") == 0.0 && r.getAs[Double]("hi") == 1.0)
      assert(math.abs(r.getAs[Double]("clo") - math.rint(1.0 / n * 1e6) / 1e6) < 1e-9)
      assert(r.getAs[Double]("chi") == 1.0)
      assert(r.getAs[Long]("nq") == 4L)
    }
  }

  test("q32's data-scale window is sharded (no whole-priority buffering)") {
    val p = SparkEntry.queries("q32_window_dist")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the row_number pass — the only window that sees data-scale rows —
    // partitions by (_pkey, _shard), the struct-wrapped null-safe key
    // plus the value-range shard: a fifth of orders can never pool in
    // one task's window buffer (the r11 state gate measured the
    // unsharded plan at 288 MB/task sf10 → 576 MB sf20, doubling every
    // rung on a 5-value key)
    assert("row_number\\(\\) windowspecdefinition\\(_pkey#\\d+, _shard#\\d+"
      .r.findAllIn(p).size == 1, p)
    // the plain low-cardinality window must not reappear (neither on
    // the raw key nor on the wrapped one)
    assert("windowspecdefinition\\((o_orderpriority|_pkey)#\\d+, o_totalprice"
      .r.findAllIn(p).isEmpty, p)
    // bounds and shard offsets come back via broadcast joins — the
    // only non-broadcast exchange the ranks need is the (key, shard)
    // hash partitioning the window sorts on
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("t18 matches a sequential reference on an adversarial name set") {
    val names = Seq(
      "cold widget", "bold widget", "old widget", "gold widget",
      "cold gear", "colt gear", "volt gear",
      "tiny bolt", "tin bolt", "brass bolt",
      "lone rod", "long rod", "stone rod")
    // many rows per name so n_a/n_b aggregation is exercised
    val parts = names.zipWithIndex.flatMap { case (n, i) =>
      (0 to i % 3).map(j => (i.toLong * 10 + j, n))
    }
    val df = parts.toDF("p_partkey", "p_name")
    val got = {
      val namesDf = df.groupBy($"p_name").agg(count(lit(1)).as("n_rows"))
        .withColumn("noun", element_at(split($"p_name", " "), 2))
      val a = namesDf.select($"p_name".as("name_a"), $"n_rows".as("n_a"), $"noun")
      val b = namesDf.select($"p_name".as("name_b"), $"n_rows".as("n_b"), $"noun")
      a.join(b, Seq("noun")).filter($"name_a" < $"name_b")
        .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
        .filter($"dist" <= 2)
        .select($"name_a", $"name_b", $"dist", $"n_a", $"n_b")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    }
    def lev(a: String, bStr: String): Int = {
      val d = Array.tabulate(a.length + 1, bStr.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to bStr.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == bStr(j - 1)) 0 else 1))
      d(a.length)(bStr.length)
    }
    val counts = parts.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = (for {
      x <- names; y <- names
      if x < y && x.split(" ")(1) == y.split(" ")(1) && lev(x, y) <= 2
    } yield (x, y, lev(x, y).toLong, counts(x), counts(y))).toSet
    assert(got == want)
  }

  test("t18 plans an equi-join on the block key, never a cartesian") {
    val p = SparkEntry.queries("t18_fuzzy_match")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "fuzzy matching went all-pairs:\n" + p)
  }

  test("p07 ORC round trip preserves adversarial strings byte-exactly") {
    val nasty = Seq(
      (1L, "line one\nline two", "en"),
      (2L, "quote\" comma, tab\tdone", "en"),
      (3L, "unicode ñ 中文 😀 end", "de"),
      (4L, "", "fr"),
      (5L, "trailing space   ", "fr"))
    val df = nasty.toDF("doc_id", "text", "lang")
    val out = java.nio.file.Files.createTempDirectory("orc-rt").toString
    df.write.mode("overwrite").option("compression", "zlib").orc(out)
    val back = spark.read.schema(df.schema).orc(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == nasty.toSet)
  }

  test("History.scd2 collapses runs and splits on change OR absence gap") {
    import graft.operators.History
    // entity 1: digest a,a,b,b  → runs [1,2]=a, [3,4]=b
    // entity 2: present v1, absent v2, present v3 with SAME digest
    //           → the gap splits: [1,1]=x, [3,3]=x
    // entity 3: single observation at v4
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "b"),
      (2L, 1L, "x"), (2L, 3L, "x"),
      (3L, 4L, "z")).toDF("id", "version", "digest")
    val got = History.scd2(rows, "id", "version", "digest")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 1L, 2L, "a"), (1L, 3L, 4L, "b"),
      (2L, 1L, 1L, "x"), (2L, 3L, 3L, "x"),
      (3L, 4L, 4L, "z")))
  }

  test("History.pitLookup answers gaps as dead and never leaks future runs") {
    import graft.operators.History
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "b"),
      (2L, 1L, "x"), (2L, 3L, "x"),
      (3L, 4L, "z")).toDF("id", "version", "digest")
    val hist = History.scd2(rows, "id", "version", "digest")
    val probes = Seq(
      (1L, 2L), (1L, 3L), // mid-run, then the revision boundary
      (2L, 2L),           // deletion gap: live before and after, dead AT 2
      (3L, 1L),           // before the entity's first observation
      (4L, 1L)            // entity never observed
    ).toDF("id", "at")
    val got = History.pitLookup(hist, probes, "id", "at")
      .select($"id", $"at", $"digest")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .toSet
    assert(got == Set(
      (1L, 2L, Some("a")), (1L, 3L, Some("b")),
      (2L, 2L, None), (3L, 1L, None), (4L, 1L, None)))
  }

  test("applyChangelog: latest wins, final-delete drops, reinsert survives") {
    import graft.operators.History
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "digest")
    val log = Seq(
      (1L, "a2", 1L, "U"), (1L, "a3", 2L, "U"), // two revisions: last wins
      (2L, null, 1L, "D"),                      // delete, never returns
      (3L, null, 1L, "D"), (3L, "c2", 2L, "U"), // delete then reinsert
      (4L, "d", 1L, "U"), (4L, null, 2L, "D"),  // insert then delete
      (5L, "e", 3L, "U")                        // brand-new key
    ).toDF("id", "digest", "seq", "op")
    val got = History.applyChangelog(snap, log, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a3", 2L), (3L, "c2", 2L), (5L, "e", 3L)))
  }

  test("incrementalAgg equals full recompute: moves, inserts, group death") {
    import graft.operators.History
    val snap = Seq(
      (1L, "a", 10L), (2L, "a", 20L), // group a: two rows
      (3L, "b", 30L),                 // group b: dies when 3 is deleted
      (4L, "c", 40L)).toDF("id", "grp", "v")
    val log = Seq[(Long, Option[String], Option[Long], Long, String)](
      (1L, Some("d"), Some(11L), 1L, "U"),  // group MOVE a→d, value change
      (3L, None, None, 1L, "D"),            // kills group b entirely
      (5L, Some("a"), Some(50L), 1L, "U"),  // brand-new key into group a
      (6L, Some("e"), Some(60L), 1L, "U"),
      (6L, None, None, 2L, "D"),            // insert+delete: no trace
      (9L, None, None, 1L, "D")             // delete of a key never seen
    ).toDF("id", "grp", "v", "seq", "op")
    val inc = History.incrementalAgg(snap, log, "id", "grp", "v", "seq", "op")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // the ground truth: apply the changelog, then aggregate
    val merged = History.applyChangelog(snap, log, "id", "seq", "op")
    val full = merged.groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full)
    assert(inc == Set(("a", 2L, 70L), ("c", 1L, 40L), ("d", 1L, 11L)))
  }

  test("ruleAudit counts NULL predicate results as violations") {
    import graft.operators.Audit
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (null, "ok"), (-5L, "bad"), (2L, null))
      .toDF("v", "s")
    val got = Audit.ruleAudit(df, "t", Seq(
        "v_pos" -> !($"v" > 0),        // null v → null pred → violation
        "s_domain" -> !$"s".isin("ok", "bad")))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("v_pos", 4L, 2L), ("s_domain", 4L, 1L)))
  }

  test("kmeansInt matches a sequential Lloyd reference, any partitioning") {
    import graft.operators.Clustering
    val rnd = new scala.util.Random(7)
    val dim = 6
    val pts = (0L until 60L).map(i => (i, Array.fill(dim)(rnd.nextDouble() * 1.6 - 0.8)))
    val quant = pts.map { case (id, v) =>
      id -> v.map(x => math.round((x + 1.0) * 1000000L))
    }.toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def ref(k: Int, iters: Int): Map[Long, Long] = {
      var cs = (0L until k.toLong).map(quant(_).clone).toArray
      def assign(): Map[Long, Int] = quant.view.mapValues { q =>
        cs.zipWithIndex.minBy { case (c, j) => (dist(q, c), j) }._2
      }.toMap
      for (_ <- 1 to iters) {
        val a = assign()
        cs = cs.zipWithIndex.map { case (old, j) =>
          val members = quant.keys.filter(a(_) == j).toSeq
          if (members.isEmpty) old
          else Array.tabulate(dim)(i => members.map(quant(_)(i)).sum / members.size)
        }
      }
      assign().map { case (id, j) => id -> j.toLong }
    }
    val df = pts.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    for (parts <- Seq(1, 7); iters <- Seq(0, 1, 3)) {
      val got = Clustering.kmeansInt(df.repartition(parts), "vec_id", "embedding",
          k = 4, iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref(4, iters), s"parts=$parts iters=$iters")
    }
  }

  test("s07 assignment stage is map-side: no join in the final plan") {
    val p = SparkEntry.queries("s07_kmeans_assign")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "centroid assignment planned a join:\n" + p)
  }

  test("native session_window and lag sessionizer agree, incl. at exactly-gap") {
    import org.apache.spark.sql.functions.{session_window, timestamp_micros, unix_micros}
    val gap = 1000000L // 1 s in us
    // user 1: gaps strictly inside/outside the boundary
    // user 2: one spacing of EXACTLY gap — both MERGE (> starts a new
    //   session, == does not): the boundary contract e14's oracle
    //   relies on, pinned here because no sf corpus exercises it
    // user 3: gap + 1 — both split
    val events = Seq(
      (1L, 10L, 0L), (1L, 11L, 500000L), (1L, 12L, 2600000L),
      (2L, 20L, 0L), (2L, 21L, gap),
      (3L, 30L, 0L), (3L, 31L, gap + 1)).toDF("user_id", "event_id", "tus")
    val native = events.withColumn("tsc", timestamp_micros($"tus"))
      .groupBy($"user_id", session_window($"tsc", s"$gap microseconds").as("win"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"win.start").as("st"), $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set((1L, 0L, 2L), (1L, 2600000L, 1L),
      (2L, 0L, 2L),
      (3L, 0L, 1L), (3L, gap + 1, 1L))
    assert(native == expected)
    val lagged = graft.operators.Sessionize.sessions(events, "user_id", "tus", "event_id", gap)
      .select($"user_id", $"session_start_us", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lagged == expected)
  }

  test("p07 query matches the per-lang aggregate of the source table") {
    val got = SparkEntry.queries("p07_orc_roundtrip")(spark, sfDir).collect()
    val want = Tables.load(spark, sfDir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum(length($"text")).as("total_text_chars"),
        // 10 hex chars = 40 bits/row, matching the query (48 bits
        // overflowed the ANSI long sum per language at sf10)
        sum(conv(substring(md5($"text"), 1, 10), 16, 10).cast("long")).as("text_sum"))
      .orderBy($"lang").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }
}
