package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

  /** Signed-random-projection LSH signature: `tables` bucket keys per
    * vector, each key = `bits` hyperplane-side bits. One fused loop over
    * tables×bits×dim — the built-in composition (tables·bits `zip_with`
    * dot products) evaluates interpreted and is ~50× slower. Planes are
    * deterministic ±1 from the seed, so keys are reproducible across
    * runs, partitions, and cluster sizes. */
  def rpSignature(vec: Column, tables: Int, bits: Int, seed: Long): Column =
    ColumnBridge.column(RandomProjectionSig(ColumnBridge.expression(vec), tables, bits, seed))

  /** See [[rpSignature]]. Input `array<float>`; output `array<long>` length tables. */
  case class RandomProjectionSig(child: Expression, tables: Int, bits: Int, seed: Long)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "rp_signature"

    override def nullSafeEval(v: Any): Any =
      VectorFunctions.rpSigCompute(v.asInstanceOf[ArrayData], tables, bits, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.VectorFunctions.rpSigCompute($c, $tables, $bits, ${seed}L)")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  private val planeCache =
    new BoundedMemo[(Int, Int, Int, Long), Array[Array[Float]]](32)

  /** ±1 hyperplanes, deterministic from seed; [tables*bits][dim]. */
  private[graft] def planesFor(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Float]] =
    planeCache.getOrCompute((tables, bits, dim, seed), { _ =>
      val rnd = new java.util.Random(seed)
      Array.fill(tables * bits, dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    })

  /** Static entry point (also called from generated Java). */
  def rpSigCompute(vec: ArrayData, tables: Int, bits: Int, seed: Long): ArrayData = {
    val dim = vec.numElements()
    val planes = planesFor(tables, bits, dim, seed)
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) { v(i) = vec.getFloat(i); i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        val plane = planes(t * bits + b)
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v(d) * plane(d); d += 1 }
        if (dot >= 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

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
