package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Mixing

/** Property-based coverage of the corpus-composition operators:
  * generated corpora (zero-token docs, single-row groups, budget
  * edges) run as distinct groups of ONE frame, same batching pattern
  * as AsOfPropertiesSpec. */
class MixingPropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("rateThreshold is monotone and brackets the hex space") {
    val rates = Gen.listOfN(300, Gen.choose(0.0, 1.0))
      .pureApply(Gen.Parameters.default, Seed(42L)).sorted
    val ths = rates.map(Mixing.rateThreshold)
    ths.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, s"thresholds not monotone: $a > $b")
      case _ =>
    }
    rates.zip(ths).foreach { case (r, t) =>
      if (r > 0 && r < 1) assert(t.length == 8 && t.forall(c => c.isDigit || c >= 'a' && c <= 'f'))
    }
  }

  private case class Doc(id: Long, toks: Long)
  private val groupGen: Gen[List[Doc]] = for {
    n <- Gen.choose(1, 12)
    toks <- Gen.listOfN(n, Gen.frequency(
      2 -> Gen.const(0L),               // zero-token docs
      6 -> Gen.choose(1L, 700L),        // straddles the 512 budget
      1 -> Gen.choose(1500L, 3000L)))   // multi-pack docs
  } yield toks.zipWithIndex.map { case (t, i) => Doc(i.toLong, t) }

  test("packSequences invariants on 400 generated groups") {
    val groups = Gen.listOfN(400, groupGen)
      .pureApply(Gen.Parameters.default, Seed(7L)).toVector
    val rows = groups.zipWithIndex.flatMap { case (g, k) =>
      g.map(d => (s"g$k", d.id, d.toks))
    }.toDF("src", "id", "n_tok")
    val budget = 512L
    val packed = Mixing.packSequences(rows, "src", "id", "n_tok", budget)
      .select($"src", $"id", $"n_tok", $"pack", $"pack_offset")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    groups.zipWithIndex.foreach { case (g, k) =>
      val got = packed(s"g$k")
      var cum = 0L
      g.zip(got).foreach { case (d, (_, id, nt, pack, off)) =>
        assert(id == d.id && nt == d.toks)
        assert(pack == cum / budget, s"g$k doc $id pack")
        assert(off == cum % budget, s"g$k doc $id offset")
        assert(off >= 0 && off < budget)
        cum += d.toks
      }
      // first doc of every group opens pack 0 at offset 0
      assert(got.head._4 == 0L && got.head._5 == 0L)
    }
  }

  test("mixTokenBudget keeps exactly the coin-order prefix that fits") {
    // 120 generated sources with 0..12 docs of 0..50 tokens, budgets
    // 0..300: survivors must equal the sequential greedy prefix.
    val srcGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.choose(0L, 50L))
      budget <- Gen.choose(0L, 300L)
    } yield (toks, budget)
    val cases = Gen.listOfN(120, srcGen)
      .pureApply(Gen.Parameters.default, Seed(20260815L)).toVector
    val rows = cases.zipWithIndex.flatMap { case ((toks, _), g) =>
      toks.zipWithIndex.map { case (t, i) => (g * 1000L + i, s"s$g", t) }
    }
    val budgets = cases.zipWithIndex.map { case ((_, b), g) => s"s$g" -> b }.toMap
    val got = Mixing.mixTokenBudget(rows.toDF("id", "src", "n_tok"),
        "id", "src", "n_tok", budgets, salt = "pt")
      .select($"id").as[Long].collect().toSet
    // sequential reference: coin order (computed via Spark for the md5,
    // one tiny job), then a running-total prefix per source
    val ordered = rows.toDF("id", "src", "n_tok")
      .withColumn("_c", substring(md5(concat($"id".cast("string"),
        lit(":pt")).cast("binary")), 1, 8))
      .collect().map(r => (r.getString(1), r.getString(3), r.getLong(0), r.getLong(2)))
    val want = ordered.groupBy(_._1).toSeq.flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy(d => (d._2, d._3)).toSeq.flatMap { case (_, _, id, t) =>
        cum += t
        if (cum <= budgets(src)) Some(id) else None
      }
    }.toSet
    assert(got == want)
  }

  test("assignSplits is a partition: every row gets exactly one valid label") {
    val d = Tables.load(spark, sfDir, "documents")
    val splits = Seq("a" -> 0.3, "b" -> 0.3, "c" -> 0.4)
    val out = Mixing.assignSplits(d, "source", splits, salt = "p")
    assert(out.count() === d.count())                       // no row lost
    val labels = out.select("split").distinct().as[String].collect().toSet
    assert(labels.subsetOf(Set("a", "b", "c")))
    // same salt, different invocation → identical assignment
    val again = Mixing.assignSplits(d, "source", splits, salt = "p")
    assert(out.select("doc_id", "split").except(
      again.select("doc_id", "split")).count() === 0)
    // a different salt reshuffles at least one group (sanity that the
    // salt is actually in the coin)
    val other = Mixing.assignSplits(d, "source", splits, salt = "q")
    val moved = out.alias("x").join(other.alias("y"), "doc_id")
      .filter(col("x.split") =!= col("y.split")).count()
    assert(moved > 0, "changing the salt moved nothing — coin ignores salt?")
  }

  test("chunkTokens equals the sliding-window reference on generated corpora") {
    val lens = Gen.listOfN(200, Gen.frequency(
        2 -> Gen.const(0), 6 -> Gen.choose(1, 40), 2 -> Gen.choose(41, 120)))
      .pureApply(Gen.Parameters.default, Seed(13L))
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
    }
    val d = docs.toDF("id", "text")
    for ((size, stride) <- Seq((5, 5), (8, 3), (3, 7), (1, 1), (64, 16))) {
      val got = Mixing.chunkTokens(d, "id", "text", size, stride)
        .select($"id", $"chunk_id", $"start_tok", $"n_tok", $"chunk")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val expected = (for {
        (id, text) <- docs
        toks = text.split(" ").filter(_.nonEmpty)
        (st, c) <- (0 until math.max(toks.length, 0) by stride).zipWithIndex
        chunk = toks.slice(st, st + size)
      } yield (id, c.toLong, st.toLong, chunk.length.toLong,
        chunk.mkString(" "))).toSet
      assert(got === expected, s"size=$size stride=$stride")
    }
  }
}
