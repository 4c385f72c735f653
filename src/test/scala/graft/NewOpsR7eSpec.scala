package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Round-7 additions part e: rank-based winsorizing (a18), PNG tEXt
  * metadata round trip (m12), and streaming zone-map maintenance
  * (e17). */
class NewOpsR7eSpec extends SparkSpec {
  import spark.implicits._

  test("a18 matches a sequential order-statistic winsorize at sf0.001") {
    val got = SparkEntry.queries("a18_winsorize")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_views"), r.getAs[Double]("lo_value"),
          r.getAs[Double]("hi_value"), r.getAs[Double]("winsor_sum"),
          r.getAs[Long]("n_clipped")))).toMap
    val views = Tables.load(spark, sfDir, "events")
      .filter($"event_type" === "view")
      .select($"user_id", $"value").as[(Long, Double)].collect()
    val ref = views.groupBy(_._1).map { case (u, vs) =>
      val vi = vs.map(v => BigDecimal(v._2 * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sorted
      val n = vi.length
      val klo = (n + 19) / 20
      val (lo, hi) = (vi(klo - 1), vi(n - klo))
      val ws = vi.map(x => math.min(math.max(x, lo), hi)).sum
      val clipped = vi.count(x => x < lo || x > hi).toLong
      u -> ((n.toLong, math.rint(lo / 1e6 * 1e6) / 1e6,
        math.rint(hi / 1e6 * 1e6) / 1e6,
        math.rint(ws / 1e6 * 1e6) / 1e6, clipped))
    }
    assert(got.keySet == ref.keySet)
    for ((u, (n, lo, hi, ws, cl)) <- ref) {
      val (gn, glo, ghi, gws, gcl) = got(u)
      assert(gn == n && gcl == cl, s"user $u counts")
      assert(math.abs(glo - lo) < 1e-9 && math.abs(ghi - hi) < 1e-9 &&
        math.abs(gws - ws) < 1e-9, s"user $u values")
    }
  }

  test("PNG tEXt chunks round-trip through real PNG bytes") {
    val entries = Seq("doc" -> "12345", "lang" -> "l3", "note" -> "a b c")
    assert(Multimodal.PngText.read(Multimodal.PngText.encode(entries))
      .sortBy(_._1) == entries.sortBy(_._1))
    assert(Multimodal.PngText.read("not a png".getBytes).isEmpty)
  }

  test("m12 query reproduces the tag arithmetic per doc at sf0.001") {
    val rows = SparkEntry.queries("m12_png_text")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, rs) =>
      val kv = rs.map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
      assert(kv == Map("doc" -> id.toString, "lang" -> s"l${id % 5}",
        "shard" -> ((id * 7) % 3).toString), s"doc $id")
    }
  }

  test("e17 streaming zone maps equal the batch per-hour stats") {
    val got = SparkEntry.queries("e17_stream_zone_maps")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(expr("((ts div 1000) div 3600000000) * 3600000000").as("w"))
      .agg(count(lit(1)).as("n"), min($"user_id"), max($"user_id"),
        min($"event_id"), max($"event_id"))
      .orderBy($"w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == batch.toSeq)
  }
}
