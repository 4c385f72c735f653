package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dense-vector math over `array<float>` embedding columns.
  *
  * Two tiers:
  *  - [[CosineSimilarity]] — a native Catalyst `Expression` with
  *    `doGenCode`: one tight primitive loop over both arrays, no
  *    per-element object churn, stays inside whole-stage codegen. This
  *    is the hot path for brute-force ANN (O(n·k·d) evaluations).
  *  - built-in compositions (`zip_with` + `aggregate`) kept as a
  *    reference implementation for cross-checking in tests.
  *
  * All accumulation is in Double regardless of input element type.
  */
object VectorFunctions {

  /** Inputs must be `array<float>` columns (not type-checked: Spark 4
    * keeps `AbstractDataType` private to the sql package). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val denom = ctx.freshName("denom")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |double $denom = Math.sqrt($na) * Math.sqrt($nb);
           |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Codegen'd cosine similarity of two `array<float>` columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Reference implementations via built-ins (for cross-checks/tests). */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normBuiltin(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosineSimBuiltin(a: Column, b: Column): Column = {
    val denom = normBuiltin(a) * normBuiltin(b)
    when(denom === 0.0, 0.0).otherwise(dotBuiltin(a, b) / denom)
  }
}
