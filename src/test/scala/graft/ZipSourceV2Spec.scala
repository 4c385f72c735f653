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

  test("parallel planning above the threshold matches driver-side planning") {
    // 100 archives > the default threshold (64): planning runs as a
    // Spark job parsing central directories on executors. Results must
    // be identical to forced-sequential planning, split-for-split.
    val many = java.nio.file.Files.createTempDirectory("graft-v2zip-many").toFile
    (0 until 100).foreach { i =>
      writeZip(many, f"arc_$i%03d.zip",
        s"doc_${i}_a.txt" -> s"alpha $i content", s"doc_${i}_b.txt" -> s"beta $i")
    }
    def readAll(thresh: Int) = spark.read.format("zip-entries")
      .option("parallelPlanningThreshold", thresh.toString)
      .load(s"$many/*.zip")
      .select($"entry_name", $"archive", $"content".cast("string").as("text"))
      .as[(String, String, String)].collect().toSet
    val parallel = readAll(1)                 // force the Spark-job path
    val sequential = readAll(Int.MaxValue)    // force the driver path
    assert(parallel == sequential)
    assert(parallel.size == 200)
    assert(parallel.exists { case (n, _, t) => n == "doc_42_a.txt" && t == "alpha 42 content" })
    // default threshold (64 <= 100 archives) also takes the parallel
    // path and plans one split per tiny archive
    val df = spark.read.format("zip-entries").load(s"$many/*.zip")
    assert(df.rdd.getNumPartitions == 100)
    assert(df.count() == 200)
  }

  test("missing path → clear error") {
    val e = intercept[Exception] {
      spark.read.format("zip-entries").load(s"$dir/nothing-*.zip").count()
    }
    assert(e.getMessage.contains("no files match") || e.getMessage.contains("nothing-"))
  }

  test("entry-granular splits: maxBytesPerSplit fans one archive out to many partitions") {
    val many = writeZip(dir, "many.zip",
      (1 to 10).map(i => (s"e$i.txt", s"payload number $i with some text")): _*)
    // 1-byte budget → one entry per split
    val df = spark.read.format("zip-entries")
      .option("maxBytesPerSplit", "1").load(many)
    assert(df.rdd.getNumPartitions == 10)
    // unchanged results vs the single-partition plan
    val sliced = df.select($"entry_name", $"content".cast("string"))
      .as[(String, String)].collect().toMap
    val whole = spark.read.format("zip-entries").load(many)
      .select($"entry_name", $"content".cast("string"))
      .as[(String, String)].collect().toMap
    assert(df.rdd.getNumPartitions > spark.read.format("zip-entries").load(many).rdd.getNumPartitions)
    assert(sliced == whole && sliced.size == 10)
    assert(sliced("e7.txt") == "payload number 7 with some text")
  }

  test("splits report preferredLocations from file block hosts") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val df = spark.read.format("zip-entries").option("maxBytesPerSplit", "1").load(zipA)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    val parts = scan.inputPartitions
    assert(parts.size == 2)
    // RawLocalFileSystem reports localhost for every block
    assert(parts.forall(_.preferredLocations().contains("localhost")))
  }

  test("last pack's coalesced range ends at the central directory, not the archive tail") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.v2.{ZipCentral, ZipSlicePartition}
    val z = writeZip(dir, "cdbound.zip",
      (1 to 6).map(i => (s"p$i.txt", s"payload $i " * 10)): _*)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(z))
    val hp = new org.apache.hadoop.fs.Path(z)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hp)
    val cd = try ZipCentral.list(in, bytes.length.toLong).get.cdOffset finally in.close()
    assert(cd > 0 && cd < bytes.length,
      s"fixture central directory should sit inside the archive (cd=$cd len=${bytes.length})")
    val df = spark.read.format("zip-entries").option("maxBytesPerSplit", "60").load(z)
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    val slices = scan.inputPartitions.collect { case p: ZipSlicePartition => p }
    assert(slices.size > 1, "fixture should plan multiple packs")
    // every pack's range stops before the central directory (ADVICE
    // r12: the old tail bound over-read the whole directory on the
    // last pack), and the content still reads back whole
    assert(slices.map(_.rangeEnd).max == cd,
      s"last pack should end at the central directory ($cd), got ${slices.map(_.rangeEnd).max}")
    val rows = df.select($"entry_name", $"content".cast("string"))
      .as[(String, String)].collect().toMap
    assert(rows.size == 6 && rows("p3.txt") == "payload 3 " * 10)
  }

  test("multi-path load reads every archive once") {
    val df = spark.read.format("zip-entries").load(zipA, zipB)
    assert(df.count() == 3)
    val byArchive = df.groupBy($"archive").count().as[(String, Long)].collect().toMap
    assert(byArchive.keys.map(_.split("/").last).toSet == Set("a.zip", "b.zip"))
  }

  test("user schema: subset accepted as projection, junk rejected") {
    val names = spark.read.format("zip-entries")
      .schema("entry_name STRING, archive STRING").load(zipA)
    assert(names.columns.toSeq == Seq("entry_name", "archive"))
    assert(names.select($"entry_name").as[String].collect().sorted.toSeq == Seq("x.txt", "y.txt"))
    val e = intercept[Exception] {
      spark.read.format("zip-entries").schema("bogus INT").load(zipA).count()
    }
    assert(e.getMessage.contains("unsupported field"))
  }

  test("STORED (uncompressed) entries read correctly through the sliced path") {
    val f = new java.io.File(dir, "stored.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f), UTF_8)
    val payload = "uncompressed bytes here".getBytes(UTF_8)
    val ze = new ZipEntry("s.txt")
    ze.setMethod(ZipEntry.STORED)
    ze.setSize(payload.length)
    ze.setCompressedSize(payload.length)
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    ze.setCrc(crc.getValue)
    zos.putNextEntry(ze); zos.write(payload); zos.closeEntry(); zos.close()
    val rows = spark.read.format("zip-entries")
      .option("maxBytesPerSplit", "1").load(f.getAbsolutePath)
      .select($"entry_name", $"content".cast("string")).as[(String, String)].collect().toMap
    assert(rows == Map("s.txt" -> "uncompressed bytes here"))
  }

  test("randomized archives: sliced reader equals ZipInputStream on every entry") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 8) {
      val f = new java.io.File(dir, s"fuzz$trial.zip")
      val zos = new ZipOutputStream(new FileOutputStream(f), UTF_8)
      val entries = (0 until 1 + rnd.nextInt(40)).map { i =>
        // unicode names, empty/tiny/large payloads, mixed compressibility
        val name = if (i % 5 == 4) s"dir$i/ünï-✓$i.txt" else s"e$i.bin"
        val payload = new Array[Byte](rnd.nextInt(if (i % 7 == 6) 200000 else 500))
        if (i % 3 == 0) rnd.nextBytes(payload) // incompressible
        else java.util.Arrays.fill(payload, ('a' + i % 26).toByte)
        name -> payload
      }
      entries.foreach { case (n, p) =>
        zos.putNextEntry(new ZipEntry(n)); zos.write(p); zos.closeEntry()
      }
      zos.close()

      // force many tiny splits so the seek-inflate path is exercised
      val got = spark.read.format("zip-entries")
        .option("maxBytesPerSplit", "1024").load(f.getAbsolutePath)
        .select($"entry_name", $"content").as[(String, Array[Byte])]
        .collect().map { case (n, c) => n -> c.toSeq }.toMap
      val expected = entries.map { case (n, p) => n -> p.toSeq }.toMap
      assert(got.keySet == expected.keySet, s"trial $trial: entry names differ")
      expected.foreach { case (n, p) =>
        assert(got(n) == p, s"trial $trial: content mismatch for $n")
      }
    }
  }

  test("coalesced range read (default) equals the per-entry positioned path") {
    // the default content path fetches each split's whole byte range in
    // ONE ranged read and inflates out of the buffer; forcing
    // coalescedContentRead=false must produce byte-identical rows
    val f = new java.io.File(dir, "coal.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f), UTF_8)
    val rnd = new scala.util.Random(20260815L)
    val entries = (0 until 30).map { i =>
      val payload = new Array[Byte](rnd.nextInt(5000))
      if (i % 2 == 0) rnd.nextBytes(payload)
      else java.util.Arrays.fill(payload, ('a' + i % 26).toByte)
      s"e$i.bin" -> payload
    }
    entries.foreach { case (n, p) =>
      zos.putNextEntry(new ZipEntry(n)); zos.write(p); zos.closeEntry()
    }
    zos.close()
    def readAll(coalesced: Boolean) = spark.read.format("zip-entries")
      .option("maxBytesPerSplit", "8192")
      .option("coalescedContentRead", coalesced.toString)
      .load(f.getAbsolutePath)
      .select($"entry_name", $"content").as[(String, Array[Byte])]
      .collect().map { case (n, c) => n -> c.toSeq }.toMap
    val viaBuffer = readAll(coalesced = true)
    val viaSeeks = readAll(coalesced = false)
    assert(viaBuffer.size == 30 && viaBuffer == viaSeeks)
    assert(viaBuffer == entries.map { case (n, p) => n -> p.toSeq }.toMap)
  }

  test("readEntryFrom: reads from a covering buffer, None outside it") {
    import graft.sources.v2.ZipCentral
    val path = writeZip(dir, "rf.zip",
      "a.txt" -> "alpha payload", "b.txt" -> "beta payload longer")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hp)
    val entries = try ZipCentral.list(in, bytes.length.toLong).get.entries finally in.close()
    val b = entries.find(_.name == "b.txt").get
    // full buffer covers everything
    assert(ZipCentral.readEntryFrom(bytes, 0L, b)
      .map(new String(_, UTF_8)).contains("beta payload longer"))
    // buffer starting past the entry's local header → fallback signal
    assert(ZipCentral.readEntryFrom(bytes.drop((b.offset + 1).toInt),
      b.offset + 1, b).isEmpty)
    // buffer truncated mid-payload → fallback signal
    assert(ZipCentral.readEntryFrom(bytes.take((b.offset + 31).toInt), 0L, b).isEmpty)
  }

  test("ZIP64 central directory (>65535 entries) parses metadata-only") {
    val f = new java.io.File(dir, "big64.zip")
    val zos = new ZipOutputStream(new FileOutputStream(f), UTF_8)
    val n = 66000
    (0 until n).foreach { i =>
      zos.putNextEntry(new ZipEntry(s"d/$i")); zos.write('a' + (i % 26)); zos.closeEntry()
    }
    zos.close()
    val df = spark.read.format("zip-entries").load(f.getAbsolutePath)
    // name-only projection: zero data I/O, straight off the ZIP64 CD
    assert(df.select($"entry_name").count() == n)
    // tiny entries: the per-split ENTRY cap (default 65536) bounds task
    // descriptor size — 66000 entries → 2 splits, not 1
    assert(df.rdd.getNumPartitions == 2)
    assert(spark.read.format("zip-entries").option("maxEntriesPerSplit", "10000")
      .load(f.getAbsolutePath).rdd.getNumPartitions == 7)
    // spot-check content through the sliced reader
    val sample = df.filter($"entry_name" === "d/27")
      .select($"content".cast("string")).as[String].head()
    assert(sample == ('a' + 1).toChar.toString)
  }
}
