package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{DotExpr, L2SqExpr}

/** Optimizer rule (SURVEY.md §4.2 custom #4): recognizes the declarative
  * higher-order-function spellings of the vector kernels and swaps in the
  * primitive codegen expressions —
  *
  *   aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, (s,v) -> s+v)
  *     ==> L2SqExpr(a, b)
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (s,v) -> s+v)
  *     ==> DotExpr(a, b)
  *
  * Both sides accumulate left-to-right in array order, so the rewrite is
  * value-identical; it only removes the per-row intermediate array and the
  * interpreted lambda calls. Applies only to `array<double>` inputs (the
  * engine's vector type — element nulls are undefined for vector kernels).
  * Injected by [[graft.GraftExtensions]]; also usable via
  * `spark.experimental.extraOptimizations`.
  */
object RewriteVectorKernels extends Rule[LogicalPlan] {

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean =
    a match {
      case v: NamedLambdaVariable => v.exprId == b.exprId
      case _                      => false
    }

  /** x (possibly behind a no-op double cast). */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case other                     => other
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  /** merge lambda is `(s, v) -> s + v` and finish is identity. */
  private def isSumMergeIdentityFinish(
      merge: Expression,
      finish: Expression
  ): Boolean = (merge, finish) match {
    case (
          LambdaFunction(Add(a1, a2, _), Seq(m1: NamedLambdaVariable, m2: NamedLambdaVariable), _),
          LambdaFunction(f: NamedLambdaVariable, Seq(fp: NamedLambdaVariable), _)
        ) =>
      sameVar(a1, m1) && sameVar(a2, m2) && f.exprId == fp.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      // L2: combine lambda multiplies two identical (x - y) differences
      case ArrayAggregate(
            ZipWith(
              l,
              r,
              LambdaFunction(
                Multiply(d1, d2, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable),
                _
              )
            ),
            Literal(0.0, DoubleType),
            merge,
            finish
          )
          if isDoubleArray(l) && isDoubleArray(r)
            && d1.semanticEquals(d2)
            && (d1 match {
              case Subtract(sx, sy, _) =>
                sameVar(stripCast(sx), x) && sameVar(stripCast(sy), y)
              case _ => false
            })
            && isSumMergeIdentityFinish(merge, finish) =>
        L2SqExpr(l, r)
      // dot: combine lambda multiplies x * y directly
      case ArrayAggregate(
            ZipWith(
              l,
              r,
              LambdaFunction(
                Multiply(mx, my, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable),
                _
              )
            ),
            Literal(0.0, DoubleType),
            merge,
            finish
          )
          if isDoubleArray(l) && isDoubleArray(r)
            && sameVar(stripCast(mx), x) && sameVar(stripCast(my), y)
            && isSumMergeIdentityFinish(merge, finish) =>
        DotExpr(l, r)
    }
}
