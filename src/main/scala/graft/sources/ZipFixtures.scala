package graft.sources

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Fixture construction for the ZIP-source round-trip checks — NOT
  * part of the query/operator surface. The driver-side collect below
  * is deliberate: building a deterministic single-file archive is test
  * scaffolding with a hard row bound, not a dataflow operator, and it
  * lives here (outside `graft.queries`) precisely so the query maps
  * stay free of driver-side materialization.
  */
object ZipFixtures {

  /** Deterministic test archive: the first `n` documents of `dir`, one
    * ZIP entry per doc, built once per (dir, n) under the system temp
    * dir and reused across invocations. */
  def docsZip(s: SparkSession, dir: String, n: Int = 50): String = {
    import s.implicits._
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_docs_${tag}_$n.zip")
    if (!java.nio.file.Files.exists(path)) {
      val docs = Tables.load(s, dir, "documents")
        .filter($"doc_id" < n).select($"doc_id", $"text")
        .as[(Long, String)].collect().sortBy(_._1)
      val zos = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(path))
      try docs.foreach { case (id, text) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(f"doc_$id%05d.txt"))
        zos.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zos.closeEntry()
      } finally zos.close()
    }
    path.toString
  }
}
