package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector distance kernels (SURVEY.md
  * §2.H): tight primitive loops over `ArrayData`, no per-pair array
  * allocation, fused into whole-stage codegen. Semantically identical to
  * the `aggregate(zip_with(...))` formulations in [[VectorFunctions]]
  * (double accumulation in array order — ref: py/bruteforce.py:5-9), just
  * faster: the zip_with path materializes an intermediate array per row
  * pair; these don't.
  *
  * SQL-surface contract (`graft_l2sq`/`graft_dot`):
  *  - inputs must be numeric arrays; any numeric element type implicitly
  *    casts to `array<double>` at analysis, anything else (strings,
  *    structs, scalars) is an analysis-time error, not a runtime crash;
  *  - element nulls are undefined (the engine's vector type is
  *    non-null-element, SURVEY.md §1.4);
  *  - RAGGED arrays are DEFINED to truncate at the shorter length — the
  *    sum runs over `min(|a|, |b|)` positions (matches zip_with-then-
  *    aggregate over the overlap; extra positions never contribute).
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  // covariant override: Seq[DataType] <: Seq[AbstractDataType], whose name
  // is private[sql] and unnameable here
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
}

/** Squared L2 distance over two double arrays. */
case class L2SqExpr(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: several instances may fuse into one codegen function
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $d = $a.getDouble($i) - $b.getDouble($i);
        |  $s += $d * $d;
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two double arrays. */
case class DotExpr(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $a.getDouble($i) * $b.getDouble($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def l2SqFast(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      L2SqExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b))
    )
  def dotFast(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b))
    )
}
