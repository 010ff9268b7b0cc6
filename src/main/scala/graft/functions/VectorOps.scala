package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared pieces of the two vector expressions: the analysis-time input
  * check (every sibling native expression reports bad types as a
  * TypeCheckFailure, not a runtime error from inside codegen) and the
  * element accessor.
  */
private[functions] trait VecExpression { self: BinaryExpression =>

  override def dataType: DataType = DoubleType

  /** NULL result cases exist beyond null inputs (length mismatch, null
    * element — see the semantics note on each expression), so the
    * expression is always nullable.
    */
  override def nullable: Boolean = true

  protected def fnName: String

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$fnName expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Fixed-order dot product over two numeric arrays as a native Catalyst
  * expression. The higher-order-function formulation
  * (`aggregate(zip_with(...))`) is interpreted per element with boxing and
  * never enters whole-stage codegen; this expression generates a primitive
  * `for` loop instead — the hot primitive of every similarity operator.
  *
  * Semantics are IDENTICAL to the SQL fold the oracles use: each element is
  * promoted to double *before* the multiply, accumulation is left-to-right
  * from 0.0 — bit-for-bit equal to DuckDB's
  * `list_reduce(list_transform(...))` left fold, so oracle-checked queries
  * can use it. Parity includes the NULL cases: `zip_with` pads a shorter
  * array with nulls and a null product nulls the whole fold, so a LENGTH
  * MISMATCH or a NULL ELEMENT yields NULL here too (silently reading null
  * slots as 0.0 and truncating to the shorter length — the pre-r11
  * behavior — diverged from the very fold this documents itself against).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecExpression {

  override protected def fnName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Fused cosine similarity: dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))
  * with all THREE accumulators in ONE array traversal. Composing three
  * `vec_dot` calls walks both arrays three times; at corpus scale the
  * similarity scan is memory-bandwidth-bound, so the fused loop is the
  * difference between one pass and three. Each partial sum performs the
  * identical left-to-right IEEE operation sequence as the composed form,
  * so results are bit-for-bit equal and oracle-checked queries can swap it
  * in without touching their DuckDB SQL. NULL parity matches [[VecDot]]:
  * length mismatch or a null element yields NULL.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with VecExpression {

  override protected def fnName: String = "vec_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
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
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $getA;
         |    double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

object VectorOps {
  /** Register `vec_dot` and `vec_cosine` in the session's function registry
    * so plain SQL / `expr(...)` strings can use them. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => VecCosine(exprs(0), exprs(1)), "built-in")
  }
}
