package graft

import org.apache.hadoop.fs.{Path => HPath}

import graft.operators.Bigrams
import graft.operators.Bigrams.RecordMode

/** Measures the price of `--hadoop-layout` byte-parity: times the
  * default TSV sink vs the MapReduce-identical placement sink
  * (Text.hashCode % N partitioning + per-partition key sort) on the
  * same warm counts frame, median of 3, one JSON line to stdout.
  * The GoldenParitySpec proves the layout is byte-identical; this
  * main records what that guarantee costs at write time.
  *
  * Usage: `tools/jrun.sh graft.LayoutBench [input] [partitions]`.
  */
object LayoutBench {

  def main(args: Array[String]): Unit = {
    val input = args.headOption.getOrElse(
      "/root/reference/src/main/resources/sample/zuni.txt")
    val nParts = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder("graft-layout-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.registerFunctions(spark)

    val counts = Bigrams.fromTextFiles(spark, input, RecordMode.Lines)
    // scratch through the shared WorkDirs precedence (conf → checkpoint
    // location → local-mode-only tmp) — same cluster-safety rules as
    // the sinks and drains, no unconditional driver-local tmpdir
    val scratch = new HPath(WorkDirs.wipedScratch(spark, "layout_bench", input))

    def time(tag: String)(write: String => Unit): Double = {
      // warm once (codegen, scan cache), then median of 3 timed runs
      val times = (0 to 3).map { i =>
        val out = new HPath(scratch, s"${tag}_$i")
        val t0 = System.nanoTime()
        write(out.toString)
        (System.nanoTime() - t0) / 1e9
      }
      times.drop(1).sorted.apply(1)
    }

    val tsvSec = time("tsv")(out => Bigrams.writeTsv(counts, out, nParts))
    val hadoopSec = time("hadoop")(out =>
      BigramJob.writeHadoopLayout(counts, out, nParts))
    scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(scratch, true)

    println(s"""{"metric":"hadoop_layout_overhead","tsv_sec":$tsvSec,""" +
      s""""hadoop_layout_sec":$hadoopSec,""" +
      s""""ratio":${hadoopSec / tsvSec},"partitions":$nParts,"input":"$input"}""")
    spark.stop()
  }
}
