package graft

/** Provenance stamp for gate artifacts (VERDICT r11 #1: the d03
  * pairParts recalibration landed AFTER the committed sf1/sf10/sf20
  * audits were produced, leaving their mining-family state columns
  * stale with nothing to notice). Every [[ShuffleAudit]] dump records
  * the git TREE hash of `src/main` at run time plus whether the
  * working tree was dirty under it, and `ScaleCheck audits` refuses
  * artifact pairs whose stamp doesn't match HEAD at check time — so
  * "gates ran on final code" is an asserted invariant, not a
  * convention.
  *
  * The SOURCE-TREE hash (`git rev-parse HEAD:src/main`), not the
  * commit SHA, is stamped deliberately: committing the artifacts
  * themselves (or docs, tests, tools) advances HEAD without changing
  * the measured code, and the invariant must survive exactly that.
  * A dirty `src/main` fails the gate outright — an audit taken from
  * uncommitted code doesn't identify what it measured.
  */
object RepoStamp {

  private def run(cmd: Seq[String]): Option[String] =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Exception => None }

  /** Tree hash of committed `src/main`; "unknown" outside a git
    * checkout (the gate then fails — artifacts need provenance). */
  def srcTree(): String =
    run(Seq("git", "rev-parse", "HEAD:src/main")).getOrElse("unknown")

  /** Uncommitted changes under `src/main`: a stamp taken from a dirty
    * tree doesn't identify the measured code. */
  def srcDirty(): Boolean =
    run(Seq("git", "status", "--porcelain", "--", "src/main"))
      .forall(_.nonEmpty)

  /** The `_meta` JSON object artifact writers embed (first key, so
    * subset extractions that copy whole entries keep it). */
  def metaJson(extra: String = ""): String =
    s""""_meta":{"src_tree":"${srcTree()}","src_dirty":${srcDirty()}$extra}"""
}
