package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOf

/** Property-based coverage of [[AsOf.asofJoin]] beyond AsOfSpec's
  * fuzz: tolerance × direction × NULL-time interactions, with times
  * drawn from a coarse grid so equal-timestamp ties and exact
  * tolerance-boundary gaps occur constantly. As-of matching is
  * independent per key, so the ≥1k generated cases run as distinct
  * keys of ONE frame — one Spark job per (direction, tolerance)
  * config, not one per case. (Raw ScalaCheck with fixed seeds — the
  * scalatest bridge artifact isn't available offline.) */
class AsOfPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** One generated case: left rows (id, time?) and right rows of a
    * future shared key. Times sit on a 10-grid in [0, 120] with ~1/8
    * NULLs: gaps of exactly 0 and exactly 20 (the tolerance bounds
    * probed below) arise in most cases. */
  private case class Case(lefts: List[(Long, Option[Long])],
                          rights: List[(Long, Option[Long])])

  private val timeGen: Gen[Option[Long]] = Gen.frequency(
    1 -> Gen.const(None),
    7 -> Gen.choose(0, 12).map(g => Some(g * 10L)))

  private val caseGen: Gen[Case] = for {
    nl <- Gen.choose(0, 4)
    nr <- Gen.choose(0, 4)
    lts <- Gen.listOfN(nl, timeGen)
    rts <- Gen.listOfN(nr, timeGen)
  } yield Case(
    lts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    rts.zipWithIndex.map { case (t, i) => (100L + i, t) })

  private val NCases = 1200
  private lazy val cases: Vector[Case] =
    Gen.listOfN(NCases, caseGen)
      .pureApply(Gen.Parameters.default, Seed(20260812L)).toVector

  /** Pure-Scala single-key oracle mirroring the merge_asof contract:
    * NULL times never match; backward picks max (rt, rid) among
    * rt ≤ lt within tolerance, forward min (rt, rid) among rt ≥ lt. */
  private def oracle(c: Case, backward: Boolean,
                     tol: Option[Long]): Map[Long, Option[Long]] =
    c.lefts.map { case (lid, lto) =>
      lid -> lto.flatMap { lt =>
        val cands = c.rights.collect {
          case (rid, Some(rt))
            if (if (backward) rt <= lt && tol.forall(lt - rt <= _)
                else rt >= lt && tol.forall(rt - lt <= _)) => (rt, rid)
        }
        if (cands.isEmpty) None
        else Some(if (backward) cands.max._2 else cands.min._2)
      }
    }.toMap

  test(s"asofJoin matches the per-key oracle on $NCases generated cases " +
    "x {backward, forward} x {no tol, tol=0, tol=20}") {
    val left = cases.zipWithIndex.flatMap { case (c, k) =>
      c.lefts.map { case (lid, t) => (k.toLong, lid, t) }
    }.toDF("k", "lid", "lt")
    val right = cases.zipWithIndex.flatMap { case (c, k) =>
      c.rights.map { case (rid, t) => (k.toLong, rid, t) }
    }.toDF("k", "rid", "rt")

    for (dir <- Seq("backward", "forward");
         tol <- Seq(None, Some(0L), Some(20L))) {
      val got = AsOf.asofJoin(left, right, Seq("k"), "lt", "rt",
          direction = dir, toleranceUs = tol, tieBreak = Seq("rid"))
        .select($"k", $"lid", $"rid")
        .as[(Long, Long, Option[Long])].collect()
        .groupBy(_._1).view
        .mapValues(_.map(r => r._2 -> r._3).toMap).toMap

      var checked = 0
      cases.zipWithIndex.foreach { case (c, k) =>
        val want = oracle(c, dir == "backward", tol)
        val have = got.getOrElse(k.toLong, Map.empty)
        assert(have == want,
          s"case $k dir=$dir tol=$tol: got $have want $want\n  case: $c")
        checked += 1
      }
      assert(checked == NCases)
    }
    // the grid must actually produce the boundary interactions the
    // test exists for — guard against a generator regression
    val allGaps = for {
      c <- cases; (_, Some(lt)) <- c.lefts; (_, Some(rt)) <- c.rights
    } yield lt - rt
    assert(allGaps.contains(0L) && allGaps.contains(20L),
      "generated data lost its equal-timestamp / tolerance-boundary gaps")
  }

  /** Nearest contract: min |lt−rt| within tolerance; equidistant
    * backward-vs-forward resolves backward; same-time ties use the
    * per-direction id order (backward max rid, forward min rid). */
  private def nearestOracle(c: Case, tol: Option[Long]): Map[Long, Option[Long]] =
    c.lefts.map { case (lid, lto) =>
      lid -> lto.flatMap { lt =>
        val cands = c.rights.collect {
          case (rid, Some(rt)) if tol.forall(t => math.abs(lt - rt) <= t) => (rt, rid)
        }
        if (cands.isEmpty) None
        else Some(cands.minBy { case (rt, rid) =>
          val back = rt <= lt
          (math.abs(lt - rt), if (back) 0L else 1L, if (back) -rid else rid)
        }._2)
      }
    }.toMap

  test(s"asofNearest matches the per-key oracle on $NCases generated cases " +
    "x {no tol, tol=0, tol=20} (the 10-grid makes equidistant ties constant)") {
    val left = cases.zipWithIndex.flatMap { case (c, k) =>
      c.lefts.map { case (lid, t) => (k.toLong, lid, t) }
    }.toDF("k", "lid", "lt")
    val right = cases.zipWithIndex.flatMap { case (c, k) =>
      c.rights.map { case (rid, t) => (k.toLong, rid, t) }
    }.toDF("k", "rid", "rt")

    for (tol <- Seq(None, Some(0L), Some(20L))) {
      val got = AsOf.asofNearest(left, right, Seq("k"), "lt", "rt",
          toleranceUs = tol, tieBreak = Seq("rid"))
        .select($"k", $"lid", $"rid")
        .as[(Long, Long, Option[Long])].collect()
        .groupBy(_._1).view
        .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
      cases.zipWithIndex.foreach { case (c, k) =>
        val want = nearestOracle(c, tol)
        val have = got.getOrElse(k.toLong, Map.empty)
        assert(have == want,
          s"case $k tol=$tol: got $have want $want\n  case: $c")
      }
    }
    // equidistant backward/forward pairs must actually occur
    val equidistant = cases.exists { c =>
      c.lefts.exists { case (_, Some(lt)) =>
        val ds = c.rights.collect { case (_, Some(rt)) => rt - lt }
        ds.exists(d => d > 0 && ds.contains(-d))
      case _ => false
      }
    }
    assert(equidistant, "generated data lost its equidistant-tie cases")
  }

  test("asofBracket's two sides equal the independent backward and forward joins") {
    val left = cases.zipWithIndex.flatMap { case (c, k) =>
      c.lefts.map { case (lid, t) => (k.toLong, lid, t) }
    }.toDF("k", "lid", "lt")
    val right = cases.zipWithIndex.flatMap { case (c, k) =>
      c.rights.map { case (rid, t) => (k.toLong, rid, t) }
    }.toDF("k", "rid", "rt")

    for (tol <- Seq(None, Some(20L))) {
      val bracket = AsOf.asofBracket(left, right, Seq("k"), "lt", "rt",
          toleranceUs = tol, tieBreak = Seq("rid"))
        .select($"k", $"lid", $"rid_b", $"rid_f")
        .as[(Long, Long, Option[Long], Option[Long])].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      def side(dir: String) = AsOf.asofJoin(left, right, Seq("k"), "lt", "rt",
          direction = dir, toleranceUs = tol, tieBreak = Seq("rid"))
        .select($"k", $"lid", $"rid")
        .as[(Long, Long, Option[Long])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val back = side("backward"); val fwd = side("forward")
      assert(bracket.keySet == back.keySet)
      bracket.foreach { case (key, (b, f)) =>
        assert(b == back(key) && f == fwd(key), s"$key tol=$tol: ($b,$f) vs (${back(key)},${fwd(key)})")
      }
    }
  }
}
