package graft

import graft.BigramJob.Config
import graft.operators.Bigrams.RecordMode

class BigramJobSpec extends SparkSpec {
  import spark.implicits._

  test("arg parsing: reference contract plus flags, clean errors") {
    assert(BigramJob.parseArgs(Seq("in", "out")) ==
      Right(Config(input = "in", output = "out")))
    assert(BigramJob.parseArgs(Seq("--mode", "file", "--zip", "--partitions", "8",
      "--hadoop-layout", "in", "out")) ==
      Right(Config(RecordMode.WholeFiles, zip = true, partitions = 8,
        hadoopLayout = true, "in", "out")))
    assert(BigramJob.parseArgs(Seq("in")).isLeft)          // the reference crashed here
    assert(BigramJob.parseArgs(Seq("a", "b", "c")).isLeft)
    assert(BigramJob.parseArgs(Seq("--mode", "bogus", "in", "out")).isLeft)
    assert(BigramJob.parseArgs(Seq("--partitions", "x", "in", "out")).isLeft)
    assert(BigramJob.parseArgs(Seq("--frobnicate", "in", "out")).isLeft)
  }

  test("--conf k=v passthrough parses, applies to the session, and rejects junk") {
    assert(BigramJob.parseArgs(Seq("--conf", "spark.sql.shuffle.partitions=7",
      "--conf", "spark.sql.ansi.enabled=false", "in", "out")) ==
      Right(Config(input = "in", output = "out",
        conf = Map("spark.sql.shuffle.partitions" -> "7",
                   "spark.sql.ansi.enabled" -> "false"))))
    // value may itself contain '='; key may not be empty
    assert(BigramJob.parseArgs(Seq("--conf", "a.b=x=y", "in", "out")) ==
      Right(Config(input = "in", output = "out", conf = Map("a.b" -> "x=y"))))
    assert(BigramJob.parseArgs(Seq("--conf", "novalue", "in", "out")).isLeft)
    assert(BigramJob.parseArgs(Seq("--conf", "=v", "in", "out")).isLeft)
    assert(BigramJob.parseArgs(Seq("--conf")).isLeft)

    // a runtime-modifiable conf reaches the live session during run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val out = java.nio.file.Files.createTempDirectory("graft-conf").toString + "/bigrams"
      BigramJob.run(spark, Config(
        input = "/root/reference/src/main/resources/sample/zuni.txt", output = out,
        conf = Map("spark.sql.shuffle.partitions" -> "7",
                   // static conf: must be skipped, not crash
                   "spark.master" -> "local[1]")))
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("hadoop-layout sink: Text.hashCode placement, sorted parts, golden key positions") {
    val out = java.nio.file.Files.createTempDirectory("graft-hl").toString + "/bigrams"
    val zuni = "/root/reference/src/main/resources/sample/zuni.txt"
    BigramJob.run(spark, Config(RecordMode.Lines, zip = false, partitions = 32,
      hadoopLayout = true, zuni, out))

    val dir = new java.io.File(out)
    val parts = dir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 32)
    assert(dir.listFiles().exists(_.getName == "_SUCCESS"))

    // keys sorted within every partition and placed per Text.hashCode % 32
    parts.zipWithIndex.foreach { case (f, idx) =>
      val keys = scala.io.Source.fromFile(f).getLines().map(_.split("\t")(0)).toList
      assert(keys == keys.sorted, s"partition $idx not sorted")
      keys.foreach { k =>
        val expected = (graft.functions.HadoopTextHash.compute(k) & Int.MaxValue) % 32
        assert(expected == idx, s"key $k in part $idx, expected $expected")
      }
    }

    // the golden sample key from SURVEY §8.4: zu+i lives in partition 26
    // with count 1700 (line mode)
    val p26 = scala.io.Source.fromFile(parts(26)).getLines()
      .map(_.split("\t")).find(_(0) == "zu+i")
    assert(p26.exists(_(1) == "1700"))

    // merged content equals the declarative pipeline's result
    val merged = parts.flatMap(f => scala.io.Source.fromFile(f).getLines())
      .map { l => val Array(k, v) = l.split("\t"); (k, v.toLong) }.toMap
    val expected = graft.operators.Bigrams
      .fromTextFiles(spark, zuni, RecordMode.Lines)
      .as[(String, Long)].collect().toMap
    assert(merged == expected)
  }
}
