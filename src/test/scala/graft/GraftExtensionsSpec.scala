package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.{ColumnBridge, ExtensionsTestBridge}

/** The extensions path must register exactly the same function table
  * as the imperative path, and its builders must produce working
  * expressions — exercised end-to-end by evaluating a looked-up
  * expression through a real plan. */
class GraftExtensionsSpec extends SparkSpec {

  test("injection registers the full graft function table into a registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = new SimpleFunctionRegistry
    ExtensionsTestBridge.applyFunctions(ext, reg)
    val injected = reg.listFunction().map(_.funcName).toSet
    assert(injected == GraftSession.SqlFunctions.map(_._1).toSet)
  }

  test("a looked-up builder produces a working expression") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = new SimpleFunctionRegistry
    ExtensionsTestBridge.applyFunctions(ext, reg)
    val e = reg.lookupFunction(FunctionIdentifier("sanitize_tokens"),
      Seq(Literal.create("Hello, Wörld! 42_x", org.apache.spark.sql.types.StringType)))
      .asInstanceOf[Expression]
    val got = spark.range(1)
      .select(ColumnBridge.column(e).as("toks"))
      .head().getSeq[String](0)
    // same semantics as the reference sanitize: punctuation, underscore
    // AND non-ASCII letters → space (Java \w is ASCII-only — the
    // ñ-stripping behavior SURVEY §8.2 pins), lowercase, ws split
    assert(got == Seq("hello", "w", "rld", "42", "x"))
  }

  test("the imperative and injected surfaces expose the same names") {
    // the shared session has registerFunctions applied by other specs
    // or not at all — assert directly against the shared table instead
    // of session state: both paths iterate GraftSession.SqlFunctions,
    // so equality of the table IS equality of the surfaces. Guard the
    // table itself against accidental emptying.
    assert(GraftSession.SqlFunctions.map(_._1).distinct.size ==
      GraftSession.SqlFunctions.size)
    assert(GraftSession.SqlFunctions.size >= 7)
  }
}
