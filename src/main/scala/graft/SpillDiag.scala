package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Diagnostic: per-stage shuffle/spill attribution for one query —
  * locates WHICH stage of an iterative chain spills. Not part of the
  * driver contract. Usage: tools/jrun.sh graft.SpillDiag <sfDir> <query> */
object SpillDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val spark = GraftSession.get("spill-diag")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val spill = (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6
        val sw = m.shuffleWriteMetrics.bytesWritten / 1e6
        val sr = m.shuffleReadMetrics.remoteBytesRead / 1e6 +
          m.shuffleReadMetrics.localBytesRead / 1e6
        if (spill > 1 || sw > 1 || sr > 1)
          println(f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%3d " +
            f"swrite=$sw%8.1f sread=$sr%8.1f spill=$spill%8.1f  ${si.name.takeWhile(_ != '\n')}")
      }
    })
    val t0 = System.nanoTime()
    // execute the FULL returned plan (a .count() would let Catalyst
    // prune windows/sorts/projections and attribute a different query)
    val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    println(f"[diag] $name total=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    spark.stop()
  }
}
