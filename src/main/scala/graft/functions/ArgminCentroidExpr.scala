package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid index (the k-means E-step argmin, ref: py/pq.py:161-171;
  * first-lowest-index wins ties). The k×d centroid matrix rides along flat
  * (`c*d + j`) as a codegen reference object — the same plan-embedding
  * tactic as the PQ expressions: no per-row Seq boxing, no broadcast
  * dereference, whole-stage codegen end to end. Validates the input type
  * at analysis and the vector length at runtime.
  */
case class ArgminCentroidExpr(child: Expression, flat: Array[Double], k: Int, d: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_argmin"

  override def checkInputDataTypes(): TypeCheckResult =
    PQCheck.vecType(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    PQCheck.requireLen(v, d, "vector", prettyName)
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val off = c * d
      var s = 0.0
      var j = 0
      while (j < d) { val df = v.getDouble(j) - flat(off + j); s += df * df; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("centroids", flat, "double[]")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val df = ctx.freshName("df")
      val off = ctx.freshName("off")
      s"""
        |${PQCheck.helper}.checkLen($a.numElements(), $d, "vector", "$prettyName");
        |int $best = 0; double $bestD = Double.MAX_VALUE;
        |for (int $c = 0; $c < $k; $c++) {
        |  int $off = $c * $d;
        |  double $s = 0.0;
        |  for (int $j = 0; $j < $d; $j++) {
        |    double $df = $a.getDouble($j) - $cb[$off + $j];
        |    $s += $df * $df;
        |  }
        |  if ($s < $bestD) { $bestD = $s; $best = $c; }
        |}
        |${ev.value} = $best;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
