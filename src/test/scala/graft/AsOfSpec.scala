package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic sides with hot keys, equal-timestamp ties,
  // keys with no right rows, and keys with no left rows
  private lazy val trades = (
    (1 to 40).map(i => (i % 5L, 100L + i, 1000L * (i % 13))) ++
      Seq((9L, 900L, 5000L)) // key with no quotes at all
    ).toDF("k", "trade_id", "t_time")
  private lazy val quotes = (
    (1 to 60).map(i => (i % 4L, 500L + i, 700L * (i % 17))) ++
      Seq((0L, 990L, 0L), (0L, 991L, 0L)) // equal-timestamp tie at t=0
    ).toDF("k", "quote_id", "q_time")

  /** Brute-force oracle: join + rank — O(n²) but obviously correct. */
  private def brute(direction: String, tol: Option[Long]): DataFrame =
    bruteOn(trades, quotes, direction, tol)

  private def bruteOn(l: DataFrame, r: DataFrame,
                      direction: String, tol: Option[Long]): DataFrame = {
    val trades = l; val quotes = r
    val cond = if (direction == "backward") $"q_time" <= $"t_time" else $"q_time" >= $"t_time"
    val tolCond = tol.map { t =>
      if (direction == "backward") $"t_time" - $"q_time" <= t else $"q_time" - $"t_time" <= t
    }.getOrElse(lit(true))
    val timeOrd = if (direction == "backward") $"q_time".desc else $"q_time".asc
    val tieOrd = if (direction == "backward") $"quote_id".desc else $"quote_id".asc
    val w = Window.partitionBy($"trade_id").orderBy(timeOrd, tieOrd)
    val matched = trades.join(quotes, Seq("k")).filter(cond && tolCond)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"k", $"trade_id", $"t_time", $"quote_id", $"q_time")
    // left semantics: unmatched trades keep null quote columns
    trades.join(matched.select($"trade_id", $"quote_id", $"q_time"), Seq("trade_id"), "left")
      .select($"k", $"trade_id", $"t_time", $"quote_id", $"q_time")
  }

  private def run(direction: String, tol: Option[Long] = None) =
    AsOf.asofJoin(trades, quotes, Seq("k"), "t_time", "q_time",
        direction = direction, toleranceUs = tol, tieBreak = Seq("quote_id"))
      .select($"k", $"trade_id", $"t_time", $"quote_id", $"q_time")

  private def asSet(df: DataFrame) =
    df.as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet

  test("backward as-of equals the brute-force join+rank oracle") {
    assert(asSet(run("backward")) == asSet(brute("backward", None)))
  }

  test("forward as-of equals the brute-force oracle") {
    assert(asSet(run("forward")) == asSet(brute("forward", None)))
  }

  test("tolerance voids distant matches but keeps the left row") {
    val tol = Some(1500L)
    val got = asSet(run("backward", tol))
    assert(got == asSet(brute("backward", tol)))
    assert(got.size == trades.count()) // left join: every trade present
    assert(got.exists(_._4.isEmpty))   // some matches voided
  }

  test("equal timestamps: right row at the left instant matches; largest tiebreak wins") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "trade_id", "t_time")
    val r = Seq((1L, 7L, 100L), (1L, 8L, 100L), (1L, 3L, 50L)).toDF("k", "quote_id", "q_time")
    val row = AsOf.asofJoin(l, r, Seq("k"), "t_time", "q_time", tieBreak = Seq("quote_id"))
      .select($"quote_id", $"q_time").as[(Long, Long)].head()
    assert(row == ((8L, 100L))) // not 7 (tie), not 3 (older)
  }

  test("null times never match: null-time right rows are ignored, null-time left rows get no match") {
    val l = Seq((1L, Some(100L)), (2L, None))
      .map { case (id, t) => (1L, id, t) }.toDF("k", "trade_id", "t_time")
    val r = Seq((5L, None), (6L, Some(40L)))
      .map { case (id, t) => (1L, id, t) }.toDF("k", "quote_id", "q_time")
    for (dir <- Seq("backward", "forward")) {
      val got = AsOf.asofJoin(l, r, Seq("k"), "t_time", "q_time",
          direction = dir, tieBreak = Seq("quote_id"))
        .select($"trade_id", $"quote_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(got(2L).isEmpty, s"$dir: null-time left row matched ${got(2L)}")
      assert(got(1L) != Some(5L), s"$dir: null-time right row was matched")
    }
    // and the non-null backward case still matches the real quote
    val bk = AsOf.asofJoin(l, r, Seq("k"), "t_time", "q_time", tieBreak = Seq("quote_id"))
      .filter($"trade_id" === 1L).select($"quote_id").as[Option[Long]].head()
    assert(bk == Some(6L))
  }

  test("randomized fuzz: both directions and tolerance match the brute oracle") {
    val rnd = new scala.util.Random(20260812L)
    // dense key space + coarse time grid → plenty of equal-timestamp
    // ties, empty keys, and hot keys
    val l = Seq.tabulate(400)(i => (rnd.nextInt(12).toLong, 10000L + i, rnd.nextInt(50) * 100L))
      .toDF("k", "trade_id", "t_time")
    val r = Seq.tabulate(250)(i => (rnd.nextInt(14).toLong, 20000L + i, rnd.nextInt(50) * 100L))
      .toDF("k", "quote_id", "q_time")
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(700L))) {
      val got = asSet(AsOf.asofJoin(l, r, Seq("k"), "t_time", "q_time",
        direction = dir, toleranceUs = tol, tieBreak = Seq("quote_id"))
        .select($"k", $"trade_id", $"t_time", $"quote_id", $"q_time"))
      val want = asSet(bruteOn(l, r, dir, tol)
        .select($"k", $"trade_id", $"t_time", $"quote_id", $"q_time"))
      assert(got == want, s"direction=$dir tolerance=$tol")
    }
  }

  test("plan: one hash exchange, no join operator") {
    val p = run("backward").queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of planned a join:\n${p.take(500)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(500))
  }
}
