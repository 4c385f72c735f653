package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.History

/** Property-based coverage of the History family (scd2 / pitLookup /
  * applyChangelog / incrementalAgg) against pure-Scala sequential
  * references. Cases batch as distinct keys of ONE frame per
  * operator — a handful of Spark jobs for ~2k generated cases. Few
  * digest/group values on purpose: unchanged-digest runs, same-seq
  * ties cannot occur (seqs are unique by construction — the operator
  * CONTRACT), and group moves arise constantly. (Raw ScalaCheck with
  * a fixed seed — the scalatest bridge artifact isn't available
  * offline.) */
class HistoryPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val digests = Gen.oneOf("a", "b", "c")
  private val groups = Gen.oneOf("g0", "g1", "g2")

  // ---- scd2 / pitLookup -------------------------------------------------

  /** Per key: which of versions 1..8 observe the key, with what digest. */
  private val obsGen: Gen[List[(Long, String)]] = for {
    present <- Gen.listOfN(8, Gen.prob(0.6))
    ds <- Gen.listOfN(8, digests)
  } yield (1 to 8).toList.zip(present.zip(ds))
    .collect { case (v, (true, d)) => (v.toLong, d) }

  private val NObs = 800
  private lazy val obsCases: Vector[List[(Long, String)]] =
    Gen.listOfN(NObs, obsGen)
      .pureApply(Gen.Parameters.default, Seed(20260813L)).toVector

  /** Sequential run-collapse: split on digest change OR version gap. */
  private def scd2Ref(obs: List[(Long, String)]): List[(Long, Long, String)] =
    obs.sortBy(_._1).foldLeft(List.empty[(Long, Long, String)]) {
      case (acc, (v, d)) => acc match {
        case (from, to, pd) :: rest if pd == d && to == v - 1 =>
          (from, v, d) :: rest
        case _ => (v, v, d) :: acc
      }
    }.reverse

  test("scd2 matches the sequential run-collapse on ~800 generated keys") {
    val rows = obsCases.zipWithIndex.flatMap { case (obs, k) =>
      obs.map { case (v, d) => (k.toLong, v, d) }
    }
    val got = History.scd2(rows.toDF("id", "version", "digest"),
        "id", "version", "digest")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val want = obsCases.zipWithIndex.flatMap { case (obs, k) =>
      scd2Ref(obs).map { case (f, t, d) => (k.toLong, f, t, d) }
    }.toSet
    assert(got == want)
  }

  test("pitLookup agrees with a sequential interval scan at every version") {
    val rows = obsCases.zipWithIndex.flatMap { case (obs, k) =>
      obs.map { case (v, d) => (k.toLong, v, d) }
    }
    val hist = History.scd2(rows.toDF("id", "version", "digest"),
      "id", "version", "digest")
    val probes = obsCases.indices.flatMap(k =>
      (1L to 8L).map(v => (k.toLong, v))).toDF("id", "at")
    val got = History.pitLookup(hist, probes, "id", "at")
      .select($"id", $"at", $"digest")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .toSet
    val want = obsCases.zipWithIndex.flatMap { case (obs, k) =>
      val runs = scd2Ref(obs)
      (1L to 8L).map { at =>
        (k.toLong, at,
          runs.collectFirst { case (f, t, d) if f <= at && at <= t => d })
      }
    }.toSet
    assert(got == want)
  }

  // ---- applyChangelog / incrementalAgg ----------------------------------

  private case class Ch(key: Long, snap: Option[(String, Long)],
                        ops: List[(Long, String, Option[(String, Long)])])

  /** Per key: optional snapshot (grp, v) and 0..5 ops with unique seqs
    * 1..n; each op is an upsert with a fresh (grp, v) or a delete. */
  private val chGen: Gen[Ch] = for {
    hasSnap <- Gen.prob(0.6)
    sg <- groups; sv <- Gen.choose(0L, 9L)
    n <- Gen.choose(0, 5)
    kinds <- Gen.listOfN(n, Gen.prob(0.65))
    gs <- Gen.listOfN(n, groups)
    vs <- Gen.listOfN(n, Gen.choose(0L, 9L))
  } yield Ch(0L,
    if (hasSnap) Some((sg, sv)) else None,
    kinds.zipWithIndex.map { case (isUp, i) =>
      (i + 1L, if (isUp) "U" else "D",
        if (isUp) Some((gs(i), vs(i))) else None)
    })

  private val NCh = 1000
  private lazy val chCases: Vector[Ch] =
    Gen.listOfN(NCh, chGen)
      .pureApply(Gen.Parameters.default, Seed(20260814L)).toVector
      .zipWithIndex.map { case (c, i) => c.copy(key = i.toLong) }

  /** Latest-wins reference: final state per key, or None if deleted/absent. */
  private def mergeRef(c: Ch): Option[(String, Long, Long)] = {
    val all = c.snap.map(p => (0L, "U", Some(p))).toList ++ c.ops
    if (all.isEmpty) None
    else {
      val (seq, op, payload) = all.maxBy(_._1)
      if (op == "D") None else payload.map { case (g, v) => (g, v, seq) }
    }
  }

  private def snapDF = chCases.flatMap(c =>
    c.snap.map { case (g, v) => (c.key, g, v) })
    .toDF("id", "grp", "v")

  private def logDF = chCases.flatMap(c => c.ops.map {
    case (seq, op, payload) =>
      (c.key, payload.map(_._1), payload.map(_._2), seq, op)
  }).toDF("id", "grp", "v", "seq", "op")

  test("applyChangelog matches the latest-wins reference on ~1k generated keys") {
    val got = History.applyChangelog(snapDF, logDF, "id", "seq", "op")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = chCases.flatMap(c => mergeRef(c).map {
      case (g, v, seq) => (c.key, g, v, seq)
    }).toSet
    assert(got == want)
  }

  test("incrementalAgg equals the full recompute over the generated changelog") {
    val got = History.incrementalAgg(snapDF, logDF, "id", "grp", "v",
        "seq", "op")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val finals = chCases.flatMap(c => mergeRef(c).map {
      case (g, v, _) => (g, v)
    })
    val want = finals.groupBy(_._1).map { case (g, rows) =>
      (g, rows.size.toLong, rows.map(_._2).sum)
    }.toSet
    assert(got == want)
  }
}
