package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives matching the reference pipeline's
  * observable semantics (reference: `src/main/java/WordCountV2.java:76-94`),
  * re-expressed as Catalyst built-ins so the whole chain stays inside
  * whole-stage codegen — no UDFs, no closures.
  *
  * Semantics preserved exactly (verified against the reference's golden
  * outputs, see SURVEY.md §8):
  *  - sanitize: `replaceAll("([^\s\w]|_)+", " ")` then lowercase. Java and
  *    Spark share regex semantics, so `\w`/`\s` are ASCII-only: `ñ` and
  *    every other non-ASCII letter becomes a space (`Zuñi` → `zu i`).
  *  - tokenize: whitespace split; empty tokens dropped (Java
  *    `StringTokenizer` never yields empties; Spark `split` does on
  *    leading delimiters, so we filter).
  *  - bigrams: adjacent-token pairs joined with `+`, strictly within one
  *    record — pairs never span records (`WordCountV2.java:88-94`).
  */
object TextFunctions {

  /** `([^\s\w]|_)+` — runs of non-word chars (plus underscore) → single space. */
  val SanitizePattern = "([^\\s\\w]|_)+"

  def sanitize(c: Column): Column = lower(regexp_replace(c, SanitizePattern, " "))

  /** Sanitized whitespace tokens, empties removed. */
  def tokenize(c: Column): Column = tokenizeRaw(sanitize(c))

  /** Whitespace tokens of an already-clean string, empties removed. */
  def tokenizeRaw(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** Adjacent-pair bigrams `tokᵢ+tokᵢ₊₁`; empty array when <2 tokens
    * (the reference drops such records, `WordCountV2.java:85-86`).
    *
    * PERF: pass a *materialized column* (attribute), never a computed
    * expression like `tokenize(col)` — the `element_at` calls inside
    * the lambda re-evaluate their child per array element (higher-order
    * functions are interpreted, no CSE), turning O(n) into O(n²). */
  def bigrams(tokens: Column, sep: String = "+"): Column =
    when(size(tokens) >= 2,
      transform(sequence(lit(0), size(tokens) - 2),
        i => concat(element_at(tokens, i + 1), lit(sep), element_at(tokens, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Word n-grams joined by `sep`; empty array when <n tokens. */
  def ngrams(tokens: Column, n: Int, sep: String = " "): Column = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(sep, (0 until n).map(j => element_at(tokens, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Character shingles (sliding substrings of length k) of a string. */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      transform(sequence(lit(1), length(c) - (k - 1)), i => c.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))
}
