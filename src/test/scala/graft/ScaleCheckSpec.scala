package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `answers`-rung bound arithmetic (the rest of ScaleCheck is
  * file-driven operational tooling exercised by the per-round gate
  * artifacts themselves). */
class ScaleCheckSpec extends AnyFunSuite {

  test("answersBound: strict default when no answer ratio is measured") {
    assert(ScaleCheck.answersBound(2.8, None, None) == 2.8)
  }

  test("answersBound: answer growth raises the bound only past the default") {
    // answer grew slower than the default bound → default stands
    assert(ScaleCheck.answersBound(2.8, None, Some(2.0)) == 2.8)
    // answer grew 4.05x → bound = 1.2 x 4.05, the d04/s03 sf80 shape
    assert(math.abs(ScaleCheck.answersBound(2.8, None, Some(4.05)) - 4.86) < 1e-9)
  }

  test("answersBound: an attributed allowlist bound takes precedence") {
    // d13's shape: output rows are linear (ratio 2.0 would give the
    // strict 2.8), the attributed internal-answer bound governs
    assert(ScaleCheck.answersBound(2.8, Some(4.9), Some(2.0)) == 4.9)
    assert(ScaleCheck.answersBound(2.8, Some(4.9), None) == 4.9)
  }
}
