package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotExpr, L2SqExpr, NfcNormalizeExpr, RollingHashWindowsExpr, TopFreqAgg, TopKAgg}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql` users get them
  * too:
  *
  *   - `graft_l2sq(a, b)`  — squared L2 distance (codegen, SURVEY F1)
  *   - `graft_dot(a, b)`   — dot product (codegen)
  *   - `graft_topk(dist, id, k)` — bounded-heap top-k aggregate (D1)
  *   - `graft_rolling_windows(text, w)` — all length-w window hashes
  *     (Rabin–Karp, one multiply-add per char)
  *   - `graft_nfc(text)` — Unicode NFC canonical-composition normalize
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

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n arguments, got ${args.length}")

  /** `k` must be a positive literal integer — resolved at function-build
    * (analysis) time, never at runtime.
    */
  private def kOf(
      e: Expression,
      name: String = "graft_topk",
      arg: String = "k"
  ): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$name: $arg must be a literal integer, got a non-constant expression")
    e.eval(null) match {
      case i: Int if i >= 1 => i
      case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
      case x => throw new IllegalArgumentException(
        s"$name: $arg must be a positive literal integer, got $x")
    }
  }

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (
      "graft_l2sq",
      "graft_l2sq(a, b) - squared L2 distance of two numeric arrays " +
        "(implicitly cast to array<double>; ragged pairs truncate at the " +
        "shorter length)",
      (args: Seq[Expression]) => {
        arity("graft_l2sq", args, 2); L2SqExpr(args(0), args(1))
      }
    ),
    (
      "graft_dot",
      "graft_dot(a, b) - dot product of two numeric arrays (implicitly " +
        "cast to array<double>; ragged pairs truncate at the shorter length)",
      (args: Seq[Expression]) => {
        arity("graft_dot", args, 2); DotExpr(args(0), args(1))
      }
    ),
    (
      "graft_topk",
      "graft_topk(dist, id, k) - k smallest (dist, id) pairs, ascending",
      (args: Seq[Expression]) => {
        arity("graft_topk", args, 3)
        TopKAgg(args(0), args(1), kOf(args(2))).toAggregateExpression()
      }
    ),
    (
      "graft_rolling_windows",
      "graft_rolling_windows(text, w) - Rabin-Karp hashes of every " +
        "length-w character window (array<bigint>, entry i hashing the " +
        "window at 1-based position i+1; empty when length(text) < w)",
      (args: Seq[Expression]) => {
        arity("graft_rolling_windows", args, 2)
        RollingHashWindowsExpr(
          args(0), kOf(args(1), "graft_rolling_windows", "w"))
      }
    ),
    (
      "graft_nfc",
      "graft_nfc(text) - Unicode NFC (canonical composition) " +
        "normalization; byte-identical to nfc_normalize in engines " +
        "implementing Unicode TR#15",
      (args: Seq[Expression]) => {
        arity("graft_nfc", args, 1); NfcNormalizeExpr(args(0))
      }
    ),
    (
      "graft_topfreq",
      "graft_topfreq(tok, capacity) - Misra-Gries heavy-hitters summary " +
        "of a string column: struct<dec, items array<struct<tok, est>>> " +
        "with est <= true <= est + dec for every item",
      (args: Seq[Expression]) => {
        arity("graft_topfreq", args, 2)
        TopFreqAgg(args(0), kOf(args(1), "graft_topfreq", "capacity"))
          .toAggregateExpression()
      }
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
