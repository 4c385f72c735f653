package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Mixing}

/** Round-7 additions part f: fixed-round k-core peeling (g08) and
  * rendezvous-hash shard assignment (x26). */
class NewOpsR7fSpec extends SparkSpec {
  import spark.implicits._

  test("kCorePeel strips stars and paths, keeps cliques") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle: the 2-core
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L), // star: all fringe
      (20L, 21L), (21L, 22L)) // path: peels from the ends
      .toDF("a", "b")
    val got = Graphs.kCorePeel(edges, "a", "b", k = 2L, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("rendezvousShard matches an md5-argmax reference; reshard moves few keys") {
    def ref(id: Long, n: Int): Long = {
      def hex(s: String) = MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      (0 until n).maxBy(sh => (hex(s"$id:$sh:rv42"), sh)).toLong
    }
    val got = spark.range(0, 200).toDF("id")
      .select($"id", Mixing.rendezvousShard($"id", 16, "rv42").as("s16"),
        Mixing.rendezvousShard($"id", 17, "rv42").as("s17"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, s16, s17) =>
      assert(s16 == ref(id, 16) && s17 == ref(id, 17), s"id=$id")
    }
    // growing 16 -> 17 should move roughly 1/17 of keys; a mod-n
    // scheme would move ~15/16. Allow generous slack on 200 samples.
    val moved = got.count { case (_, a, b) => a != b }
    assert(moved > 0 && moved < 40, s"moved=$moved of 200")
  }

  test("x26 on sf0.001: shards in range, moved flag consistent") {
    val rows = SparkEntry.queries("x26_reshard_audit")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s16, s17) = (r.getAs[Long]("shard16"), r.getAs[Long]("shard17"))
      assert(s16 >= 0 && s16 < 16 && s17 >= 0 && s17 < 17)
      assert(r.getAs[Long]("moved") == (if (s16 != s17) 1L else 0L))
    }
    val frac = rows.map(_.getAs[Long]("moved")).sum.toDouble / rows.length
    assert(frac < 0.2, s"moved fraction $frac")
  }

  test("g08 on sf0.001: planted trios survive peeling with deg >= 2") {
    val got = SparkEntry.queries("g08_kcore")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("deg")).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(_ >= 2L), "a surviving vertex has degree < k")
    // every planted trio is a 3-clique: peeling can never remove it
    val sliceIds = Tables.load(spark, sfDir, "documents")
      .filter(expr("doc_id % 20 = 1")).select($"doc_id").as[Long].collect()
    assert(sliceIds.nonEmpty)
    sliceIds.foreach { id =>
      assert(got.contains(id) && got.contains(id + graft.queries.Planted.Off) &&
        got.contains(id + graft.queries.Planted.Off2), s"trio of $id missing from 2-core")
    }
  }
}
