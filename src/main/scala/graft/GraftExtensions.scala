package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotExpr, L2SqExpr, TopKAgg}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get them
  * too:
  *
  *   - `graft_l2sq(a, b)`  — squared L2 distance (codegen, SURVEY F1)
  *   - `graft_dot(a, b)`   — dot product (codegen)
  *   - `graft_topk(dist, id, k)` — bounded-heap top-k aggregate (D1)
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder
      ))
    }
    e.injectOptimizerRule(_ => graft.plans.RewriteVectorKernels)
  }
}

object GraftExtensions {

  private def kOf(e: Expression): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case x => throw new IllegalArgumentException(s"k must be a literal int, got $x")
  }

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (
      "graft_l2sq",
      "graft_l2sq(a, b) - squared L2 distance of two double arrays",
      (args: Seq[Expression]) => L2SqExpr(args(0), args(1))
    ),
    (
      "graft_dot",
      "graft_dot(a, b) - dot product of two double arrays",
      (args: Seq[Expression]) => DotExpr(args(0), args(1))
    ),
    (
      "graft_topk",
      "graft_topk(dist, id, k) - k smallest (dist, id) pairs, ascending",
      (args: Seq[Expression]) =>
        TopKAgg(args(0), args(1), kOf(args(2))).toAggregateExpression()
    )
  )

  /** Install the same functions into an already-running session (the
    * builder-time extension path needs a fresh session; this one doesn't).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
