package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic: phase timing of one streaming drain (batch counts +
  * per-batch durations via the listener) to locate the fixed overhead
  * the e-family pays per drain. Not part of the driver contract. */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "e15_stream_session_window"
    val spark = GraftSession.get("stream-diag")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[diag] query started ${System.nanoTime() / 1000000}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[diag] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} stateRows=${Option(p.stateOperators).map(_.map(_.numRowsTotal).mkString(",")).getOrElse("")}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[diag] query terminated ${System.nanoTime() / 1000000}")
    }
    spark.streams.addListener(listener)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[diag] run $i total=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    for ((k, v) <- args.drop(2).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v) }) {
      spark.conf.set(k, v)
      println(s"[diag] set $k=$v")
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[diag] after-set total=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      val t1 = System.nanoTime()
      val n2 = SparkEntry.queries(name)(spark, dir).count()
      println(f"[diag] after-set run2 total=${(System.nanoTime() - t1) / 1e9}%.2fs rows=$n2")
    }
    spark.stop()
  }
}
