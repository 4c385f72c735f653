package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.sources.CorpusSink

class CorpusSinkSpec extends SparkSpec {
  import spark.implicits._

  private def partDirs(root: Path): Map[String, Seq[Path]] =
    Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      .map { d =>
        d.getFileName.toString ->
          Files.list(d).iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      }.toMap

  // skewed frame: language 'en' holds 80% of rows, 4 long-tail langs
  private lazy val skewed = (
    (0 until 800).map(i => (i.toLong, "en", s"doc english $i")) ++
      (0 until 200).map(i => (1000L + i, s"l${i % 4}", s"doc other $i"))
    ).toDF("doc_id", "lang", "text")

  test("co-located write: one file per partition value, exact roundtrip") {
    val out = Files.createTempDirectory("graft-sink1")
    CorpusSink.writeParquet(skewed, out.toString, Seq("lang"))
    val dirs = partDirs(out)
    assert(dirs.keySet == Set("lang=en", "lang=l0", "lang=l1", "lang=l2", "lang=l3"))
    // 4 shuffle partitions in the test session, but co-location means
    // exactly ONE file per value — not files x tasks
    dirs.foreach { case (d, files) => assert(files.size == 1, s"$d: ${files.size} files") }
    val back = spark.read.parquet(out.toString)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect().toSet
    assert(back == skewed.as[(Long, String, String)].collect().toSet)
  }

  test("hot partitions spread over filesPerPart salted files; roundtrip holds") {
    val out = Files.createTempDirectory("graft-sink2")
    // this test's rows are tiny, so AQE's partition coalescing would
    // (correctly) fold the salt groups back into one writer — disable
    // it here to observe the routing itself; at real volume the hot
    // value's salt groups exceed the advisory size and stay separate
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try CorpusSink.writeParquet(skewed, out.toString, Seq("lang"), filesPerPart = 8)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val dirs = partDirs(out)
    assert(dirs("lang=en").size > 1, "hot partition stayed on one writer")
    dirs.foreach { case (d, files) =>
      assert(files.size <= 8, s"$d wrote ${files.size} > filesPerPart files")
    }
    val back = spark.read.parquet(out.toString)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect().toSet
    assert(back == skewed.as[(Long, String, String)].collect().toSet)
  }

  test("maxRecordsPerFile caps file size from the other side") {
    val out = Files.createTempDirectory("graft-sink3")
    CorpusSink.writeParquet(skewed, out.toString, Seq("lang"),
      maxRecordsPerFile = 100L)
    val dirs = partDirs(out)
    // en holds 800 rows -> at least 8 rolled files despite co-location
    assert(dirs("lang=en").size >= 8, s"en: ${dirs("lang=en").size} files")
    assert(spark.read.parquet(out.toString).count() == 1000)
  }

  test("sortBy lays rows out ordered inside every file") {
    val out = Files.createTempDirectory("graft-sink4")
    CorpusSink.writeParquet(skewed, out.toString, Seq("lang"),
      maxRecordsPerFile = 100L, sortBy = Seq("doc_id"))
    // every individual FILE must be internally sorted — that is what
    // gives parquet row-group min/max stats their pruning power
    val allFiles = partDirs(out).values.flatten
    assert(allFiles.nonEmpty)
    allFiles.foreach { f =>
      val ids = spark.read.parquet(f.toString)
        .select($"doc_id").as[Long].collect().toSeq
      assert(ids == ids.sorted, s"$f is not sorted by doc_id")
    }
    assert(spark.read.parquet(out.toString).count() == 1000)
  }

  test("rejects missing partition columns") {
    intercept[IllegalArgumentException](
      CorpusSink.writeParquet(skewed, "/tmp/never", Seq("nope")))
    intercept[IllegalArgumentException](
      CorpusSink.writeParquet(skewed, "/tmp/never", Nil))
  }
}
