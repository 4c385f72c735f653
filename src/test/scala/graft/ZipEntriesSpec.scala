package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.operators.Bigrams
import graft.operators.Bigrams.RecordMode
import graft.sources.ZipEntries

class ZipEntriesSpec extends SparkSpec {
  import spark.implicits._

  private def makeZip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos, UTF_8)
    entries.foreach { case (name, text) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(text.getBytes(UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private def writeZipFile(entries: (String, String)*): String = {
    val f = java.nio.file.Files.createTempFile("graft-test", ".zip").toFile
    val out = new FileOutputStream(f)
    out.write(makeZip(entries: _*)); out.close()
    f.getAbsolutePath
  }

  test("readArchive: every entry exactly once, order preserved, dirs skipped") {
    val bytes = makeZip("a.txt" -> "alpha", "b.txt" -> "bravo", "c.txt" -> "")
    val got = ZipEntries.readArchive(bytes)
    assert(got.map(_._1) == Seq("a.txt", "b.txt", "c.txt"))
    assert(got.map(p => new String(p._2, UTF_8)) == Seq("alpha", "bravo", ""))
  }

  test("entries DataFrame: one row per entry (no duplicate-first-entry bug)") {
    val path = writeZipFile("x.txt" -> "one two", "y.txt" -> "three four", "empty.txt" -> "")
    val df = ZipEntries.entries(spark, path)
    assert(df.columns.toSeq == Seq("entry_name", "content"))
    assert(df.count() == 3)
    val names = df.select("entry_name").as[String].collect().sorted.toSeq
    assert(names == Seq("empty.txt", "x.txt", "y.txt"))
  }

  test("entryText decodes UTF-8; entryLines explodes \\n and \\r\\n") {
    val path = writeZipFile("a.txt" -> "l1\nl2\r\nl3", "b.txt" -> "solo")
    val whole = ZipEntries.entryText(spark, path)
      .as[(String, String)].collect().toMap
    assert(whole("a.txt") == "l1\nl2\r\nl3")
    assert(whole("b.txt") == "solo")
    val lines = ZipEntries.entryLines(spark, path)
      .as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(lines("a.txt") == Seq("l1", "l2", "l3"))
    assert(lines("b.txt") == Seq("solo"))
  }

  test("bigrams from zip: line vs whole-file record granularity") {
    // 'b c' spans the newline only in whole-file mode
    val path = writeZipFile("d.txt" -> "a b\nc d")
    val line = Bigrams.fromZip(spark, path, RecordMode.Lines)
      .as[(String, Long)].collect().toMap
    assert(line == Map("a+b" -> 1L, "c+d" -> 1L))
    val whole = Bigrams.fromZip(spark, path, RecordMode.WholeFiles)
      .as[(String, Long)].collect().toMap
    assert(whole == Map("a+b" -> 1L, "b+c" -> 1L, "c+d" -> 1L))
  }

  test("<2-token entries contribute nothing") {
    val path = writeZipFile("one.txt" -> "single", "none.txt" -> "...", "ok.txt" -> "p q")
    val got = Bigrams.fromZip(spark, path, RecordMode.WholeFiles)
      .as[(String, Long)].collect().toMap
    assert(got == Map("p+q" -> 1L))
  }
}
