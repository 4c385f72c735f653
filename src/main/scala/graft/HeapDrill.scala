package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Constrained-heap degradation drill (VERDICT r10 "what's missing"
  * #2): every zero-spill number so far came from one 128 GiB JVM,
  * where a query can lean on headroom a real cluster never grants —
  * there a task gets 1–4 GB of executor memory, period. This drill
  * runs the heavy family inside a DELIBERATELY small JVM (the wrapper
  * sets `SPARK_DRIVER_MEM`, e.g. 8g with `SPARK_GRAFT_CPUS=8` ≈
  * 0.35 GB of execution memory per task slot — the per-task share of
  * a 2-core / 8 GB container with default `spark.memory.fraction`)
  * and asserts GRACEFUL degradation:
  *
  *  - every query COMPLETES — no OOM (an executor OOM in local mode
  *    kills the JVM, so the artifact simply not appearing is the
  *    failure signal the wrapper script checks);
  *  - spill is RECORDED, not forbidden: under a constrained heap,
  *    bounded spill is the designed behavior (sorts and aggregates
  *    degrade to external mode). The artifact carries per-query spill
  *    so a rung-over-rung diff can still flag runaway state.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=8g SPARK_GRAFT_CPUS=8 \
  *     tools/jrun.sh graft.HeapDrill <sfDir> <out.json> <query...>
  */
object HeapDrill {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: HeapDrill <sfDir> <out.json> <query...>")
    val sfDir = args(0)
    val outPath = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.registerFunctions(spark)
    GraftSession.installOptimizations(spark)

    val heapMb = Runtime.getRuntime.maxMemory() / 1048576
    System.err.println(s"[heapdrill] heap ${heapMb} MB, local[$cpus], $sfDir")

    // NO warm pass: the drill wants the cold path too (a warm pass
    // would pre-spill memo fits under the tight heap and muddy
    // attribution). Queries run strictly serially; settle between
    // them so ContextCleaner debt doesn't land in the next query.
    val rows = names.map { name =>
      System.err.println(s"[heapdrill] run $name")
      Bench.settle(spark, rounds = 1, sleepMs = 200)
      try {
        val m = ShuffleAudit.measure(spark, SparkEntry.queries(name), sfDir)
        (name, Some(m), None: Option[String])
      } catch {
        case t: Throwable =>
          (name, None, Some(t.getClass.getSimpleName))
      }
    }
    val allOk = rows.forall(_._2.isDefined)
    val maxSpill = rows.flatMap(_._2).map(_.taskSpillMb).maxOption.getOrElse(0.0)
    val body = rows.map {
      case (n, Some(m), _) =>
        s""" "$n":{"ok":true,"wall_s":${m.wallSec},"task_shuffle_mb":${m.taskShuffleMb},""" +
          s""""task_spill_mb":${m.taskSpillMb}}"""
      case (n, None, err) =>
        s""" "$n":{"ok":false,"error":"${err.getOrElse("unknown")}"}"""
    }.mkString(",\n")
    val json =
      s"""{
         | "note": "graft.HeapDrill constrained-heap degradation drill: the heavy family inside a ${heapMb} MB JVM with $cpus task slots (~${math.round(heapMb * 0.6 / cpus.toInt)} MB execution memory per slot — a cluster-container share, not a 128 GiB workstation). The gate is COMPLETION (no OOM; an OOM kills the JVM and no artifact appears); spill is recorded as the designed degradation path, not forbidden.",
         | "heap_mb": $heapMb,
         | "cpus": $cpus,
         | "sf_dir": "$sfDir",
         | "max_task_spill_mb": $maxSpill,
         | "all_ok": $allOk,
         |$body
         |}""".stripMargin
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
