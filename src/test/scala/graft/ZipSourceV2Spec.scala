package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.ZipEntries

class ZipSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def writeZip(dir: java.io.File, name: String, entries: (String, String)*): String = {
    val f = new java.io.File(dir, name)
    val zos = new ZipOutputStream(new FileOutputStream(f), UTF_8)
    entries.foreach { case (n, text) =>
      zos.putNextEntry(new ZipEntry(n)); zos.write(text.getBytes(UTF_8)); zos.closeEntry()
    }
    zos.close()
    f.getAbsolutePath
  }

  private lazy val dir = java.nio.file.Files.createTempDirectory("graft-v2zip").toFile
  private lazy val zipA = writeZip(dir, "a.zip", "x.txt" -> "one two", "y.txt" -> "three")
  private lazy val zipB = writeZip(dir, "b.zip", "z.txt" -> "four five six")

  test("format(zip-entries) reads one row per entry with archive column") {
    val df = spark.read.format("zip-entries").load(zipA)
    assert(df.columns.toSeq == Seq("entry_name", "archive", "content"))
    val rows = df.select($"entry_name", $"content".cast("string"))
      .as[(String, String)].collect().toMap
    assert(rows == Map("x.txt" -> "one two", "y.txt" -> "three"))
  }

  test("glob over multiple archives; one partition per archive") {
    zipA; zipB
    val df = spark.read.format("zip-entries").load(s"$dir/*.zip")
    assert(df.count() == 3)
    assert(df.rdd.getNumPartitions == 2)
    val byArchive = df.groupBy($"archive").count().as[(String, Long)].collect().toMap
    assert(byArchive.keys.map(_.split("/").last).toSet == Set("a.zip", "b.zip"))
  }

  test("column pruning: name-only projection skips content materialization") {
    val df = spark.read.format("zip-entries").load(zipA).select("entry_name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("entry_name") && !plan.contains("content#"))
    assert(df.as[String].collect().sorted.toSeq == Seq("x.txt", "y.txt"))
  }

  test("agrees with the binaryFile+flatMap source") {
    val v2 = spark.read.format("zip-entries").load(zipA)
      .select($"entry_name", $"content".cast("string").as("text"))
      .as[(String, String)].collect().toSet
    val v1 = ZipEntries.entryText(spark, zipA).as[(String, String)].collect().toSet
    assert(v2 == v1)
  }

  test("missing path → clear error") {
    val e = intercept[Exception] {
      spark.read.format("zip-entries").load(s"$dir/nothing-*.zip").count()
    }
    assert(e.getMessage.contains("no files match") || e.getMessage.contains("nothing-"))
  }
}
