package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{Event, Session}

class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60L * 1000000 // one minute in µs
  // keep event times above the initial watermark (epoch 0)
  private val Base = 1440 * Min

  test("gap-based sessions emit on inactivity timeout via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StreamingSessionize.sessionize(input.toDS(), gapUs = 30 * Min)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_test")
      .outputMode("append").start()

    // user 1: two sessions 100 min apart; user 2: one session
    input.addData(
      Event(1L, 1L, Base), Event(1L, 2L, Base + 10 * Min), Event(1L, 3L, Base + 20 * Min),
      Event(2L, 4L, Base + 5 * Min))
    query.processAllAvailable()
    input.addData(Event(1L, 5L, Base + 120 * Min), Event(1L, 6L, Base + 125 * Min))
    query.processAllAvailable()
    // two watermark-advancing events: the first advances the watermark,
    // the second gives the engine a batch in which timeouts fire
    input.addData(Event(99L, 7L, Base + 1000 * Min))
    query.processAllAvailable()
    input.addData(Event(99L, 8L, Base + 2000 * Min))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("sessions_test").as[Session].collect()
      .filter(_.user_id != 99L).toSet
    assert(got == Set(
      Session(1L, Base, Base + 20 * Min, 3L),
      Session(1L, Base + 120 * Min, Base + 125 * Min, 2L),
      Session(2L, Base + 5 * Min, Base + 5 * Min, 1L)))
  }

  test("streaming sessions match the batch sessionizer on ordered data") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic synthetic stream: 3 users × events with varied gaps
    val events = for {
      u <- 1L to 3L
      i <- 0L until 20L
    } yield Event(u, u * 100 + i, Base + i * (7 + u) * Min + (if (i > 12) 90 * Min else 0))
    val input = MemoryStream[Event]
    val sessions = StreamingSessionize.sessionize(input.toDS(), gapUs = 30 * Min)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_batchcmp")
      .outputMode("append").start()
    input.addData(events: _*)
    query.processAllAvailable()
    input.addData(Event(99L, 9998L, Base + 100000 * Min))
    query.processAllAvailable()
    input.addData(Event(99L, 9999L, Base + 200000 * Min))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("sessions_batchcmp").as[Session].collect()
      .filter(_.user_id != 99L).toSet

    // batch oracle: same gap logic via sort + fold per user
    val batch = events.groupBy(_.user_id).flatMap { case (u, evs) =>
      val ts = evs.map(_.tus).sorted
      val groups = ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last <= 30 * Min) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      groups.map(g => Session(u, g.head, g.last, g.length))
    }.toSet
    assert(streamed == batch)
  }
}
