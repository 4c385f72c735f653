package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-directory hygiene rule so it cannot regrow
  * (VERDICT r07/r08/r09 each found one fresh violation): every main
  * scratch path must resolve through [[WorkDirs]] — the one place that
  * knows driver-local tmp is only legal in local mode. A raw
  * `Files.createTempDirectory` / `java.io.tmpdir` in a query, sink,
  * drain, or gate silently writes executor-unreachable paths on a real
  * cluster. Tests are exempt (they run driver-only by construction);
  * `WorkDirs.scala` itself holds the single sanctioned tmpdir fallback.
  */
class ScratchHygieneSpec extends AnyFunSuite {

  private val forbidden = Seq("createTempDirectory", "createTempFile", "java.io.tmpdir")

  test("src/main uses WorkDirs for all scratch — no raw temp-dir APIs") {
    val root = Paths.get("src", "main", "scala")
    assert(Files.isDirectory(root), s"expected source tree at $root (cwd=${Paths.get("").toAbsolutePath})")
    val sources: Seq[Path] = {
      val stream = Files.walk(root)
      try stream.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
      finally stream.close()
    }
    assert(sources.size > 50, s"suspiciously few sources found: ${sources.size}")
    val offenders = sources
      .filterNot(_.getFileName.toString == "WorkDirs.scala")
      .flatMap { p =>
        val text = Files.readString(p)
        forbidden.filter(text.contains).map(hit => s"$p contains '$hit'")
      }
    assert(offenders.isEmpty,
      "scratch paths must go through WorkDirs (see its scaladoc):\n" +
        offenders.mkString("\n"))
  }
}
