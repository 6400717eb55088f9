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

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "graft_l2sq(a, b) - squared L2 distance of two double arrays"),
      (args: Seq[Expression]) => L2SqExpr(args(0), args(1))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotExpr(args(0), args(1))
    ))
    e.injectFunction((
      FunctionIdentifier("graft_topk"),
      info(
        "graft_topk",
        "graft_topk(dist, id, k) - k smallest (dist, id) pairs, ascending"
      ),
      (args: Seq[Expression]) => {
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other =>
            other.eval(null) match {
              case i: Int  => i
              case l: Long => l.toInt
              case x => throw new IllegalArgumentException(s"k must be a literal int, got $x")
            }
        }
        TopKAgg(args(0), args(1), k).toAggregateExpression()
      }
    ))
  }
}
