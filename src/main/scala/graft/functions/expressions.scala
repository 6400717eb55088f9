package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/** RaBitQ sign dot: `Σ_j (bit j of left set ? right[j] : -right[j])` —
  * the 1-bit serving inner loop (bq_rabitq_rerank), with the sign bits
  * packed 16 per int word LSB-first (word `j >> 4`, bit `j & 15` — the
  * BQModel packing). Bit-identical to the HOF formulation
  * `aggregate(sequence(0, n-1), 0D, (acc, j) -> acc + IF(bit, rq[j],
  * -rq[j]))` — same ascending-j fold — but one primitive loop in
  * whole-stage codegen instead of a per-element lambda walk on the
  * |Q|·N candidate hot path. `j` ranges over the right (query) array;
  * missing high words read as 0-bits would be out-of-bounds instead, so
  * the loop is bounded by both sides.
  */
case class BitSignDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val w = a.asInstanceOf[ArrayData]
    val r = b.asInstanceOf[ArrayData]
    val n = math.min(r.numElements(), w.numElements() * 16)
    var s = 0.0
    var j = 0
    while (j < n) {
      val v = r.getDouble(j)
      s += (if (((w.getInt(j >> 4) >> (j & 15)) & 1) == 1) v else -v)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
        |int $n = java.lang.Math.min($b.numElements(), $a.numElements() * 16);
        |double $s = 0.0;
        |for (int $j = 0; $j < $n; $j++) {
        |  double $v = $b.getDouble($j);
        |  $s += ((($a.getInt($j >> 4) >> ($j & 15)) & 1) == 1) ? $v : -$v;
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override def prettyName: String = "bit_sign_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MaxSim late-interaction score (Khattab & Zaharia 2020) over two bags of
  * token vectors: `Σ_{qt ∈ left} max_{dt ∈ right} qt·dt`. Semantically
  * identical to the HOF formulation
  * `aggregate(qtoks, 0.0, (acc, qt) -> acc + array_max(transform(dtoks,
  * dt -> dot(qt, dt))))` — same token fold order, same left-to-right dot,
  * same truncate-at-shorter ragged rule, empty right bag → NULL, empty
  * left bag → 0.0 — but as one fused primitive loop: the HOF path
  * allocates a scores array per pair and walks lambda closures per token;
  * this walks the nested `ArrayData` directly inside whole-stage codegen.
  */
case class MaxSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(ArrayType(DoubleType)))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val d = b.asInstanceOf[ArrayData]
    val nq = q.numElements()
    val nd = d.numElements()
    if (nq > 0 && nd == 0) return null // array_max of an empty list
    var total = 0.0
    var t = 0
    while (t < nq) {
      val qt = q.getArray(t)
      var best = Double.NegativeInfinity
      var u = 0
      while (u < nd) {
        val dt = d.getArray(u)
        val n = math.min(qt.numElements(), dt.numElements())
        var s = 0.0
        var i = 0
        while (i < n) {
          s += qt.getDouble(i) * dt.getDouble(i)
          i += 1
        }
        // NaN is the greatest element under Spark's Double ordering, so
        // array_max would return it — mirror that, or the two documented-
        // identical forms diverge on NaN inputs
        if (s > best || java.lang.Double.isNaN(s)) best = s
        u += 1
      }
      total += best
      t += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nq = ctx.freshName("nq")
      val nd = ctx.freshName("nd")
      val total = ctx.freshName("total")
      val t = ctx.freshName("t")
      val u = ctx.freshName("u")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val qt = ctx.freshName("qt")
      val dt = ctx.freshName("dt")
      val ad = classOf[ArrayData].getName
      s"""
        |int $nq = $a.numElements();
        |int $nd = $b.numElements();
        |if ($nq > 0 && $nd == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $total = 0.0;
        |  for (int $t = 0; $t < $nq; $t++) {
        |    $ad $qt = $a.getArray($t);
        |    double $best = Double.NEGATIVE_INFINITY;
        |    for (int $u = 0; $u < $nd; $u++) {
        |      $ad $dt = $b.getArray($u);
        |      int $n = java.lang.Math.min($qt.numElements(), $dt.numElements());
        |      double $s = 0.0;
        |      for (int $i = 0; $i < $n; $i++) {
        |        $s += $qt.getDouble($i) * $dt.getDouble($i);
        |      }
        |      if ($s > $best || Double.isNaN($s)) $best = $s;
        |    }
        |    $total += $best;
        |  }
        |  ${ev.value} = $total;
        |}
      """.stripMargin
    })

  override def prettyName: String = "maxsim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Compressed (ADC) MaxSim over a per-query dot-LUT and per-doc token
  * codes — the serving kernel of PLAID-style late interaction
  * (knn_maxsim_pq). Left: `array<array<array<double>>>` — for each query
  * token, one dot-LUT per code subspace (`lut[t][s][k] = qslice(t,s) ·
  * centroid(s,k)`). Right: `array<array<short>>` — for each doc token,
  * its code per subspace. Score = `Σ_t max_u Σ_s lut[t][s][code[u][s]]`
  * — per doc-token dot is |s| array lookups, never a decode.
  * Bit-identical to the element_at HOF formulation (same subspace add
  * order, empty right bag → NULL, empty left → 0.0), fused to one
  * primitive loop nest.
  */
case class MaxSimAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(ArrayType(ArrayType(DoubleType))),
    ArrayType(ArrayType(org.apache.spark.sql.types.ShortType)))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val d = b.asInstanceOf[ArrayData]
    val nq = q.numElements()
    val nd = d.numElements()
    if (nq > 0 && nd == 0) return null
    var total = 0.0
    var t = 0
    while (t < nq) {
      val luts = q.getArray(t) // [s][k]
      val ns = luts.numElements()
      var best = Double.NegativeInfinity
      var u = 0
      while (u < nd) {
        val codes = d.getArray(u) // [s]
        val m = math.min(ns, codes.numElements())
        var s = 0.0
        var si = 0
        while (si < m) {
          val lut = luts.getArray(si)
          val code = codes.getShort(si).toInt
          if (code < 0 || code >= lut.numElements()) {
            throw new IllegalArgumentException(
              s"maxsim_adc: code $code out of range for LUT of ${lut.numElements()} entries (subspace $si)")
          }
          s += lut.getDouble(code)
          si += 1
        }
        // NaN = greatest, matching array_max (see MaxSimExpr)
        if (s > best || java.lang.Double.isNaN(s)) best = s
        u += 1
      }
      total += best
      t += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nq = ctx.freshName("nq")
      val nd = ctx.freshName("nd")
      val total = ctx.freshName("total")
      val t = ctx.freshName("t")
      val u = ctx.freshName("u")
      val si = ctx.freshName("si")
      val m = ctx.freshName("m")
      val ns = ctx.freshName("ns")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val luts = ctx.freshName("luts")
      val codes = ctx.freshName("codes")
      val lut = ctx.freshName("lut")
      val code = ctx.freshName("code")
      val ad = classOf[ArrayData].getName
      s"""
        |int $nq = $a.numElements();
        |int $nd = $b.numElements();
        |if ($nq > 0 && $nd == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $total = 0.0;
        |  for (int $t = 0; $t < $nq; $t++) {
        |    $ad $luts = $a.getArray($t);
        |    int $ns = $luts.numElements();
        |    double $best = Double.NEGATIVE_INFINITY;
        |    for (int $u = 0; $u < $nd; $u++) {
        |      $ad $codes = $b.getArray($u);
        |      int $m = java.lang.Math.min($ns, $codes.numElements());
        |      double $s = 0.0;
        |      for (int $si = 0; $si < $m; $si++) {
        |        $ad $lut = $luts.getArray($si);
        |        int $code = (int) $codes.getShort($si);
        |        if ($code < 0 || $code >= $lut.numElements()) {
        |          throw new IllegalArgumentException(
        |            "maxsim_adc: code " + $code + " out of range for LUT of "
        |            + $lut.numElements() + " entries (subspace " + $si + ")");
        |        }
        |        $s += $lut.getDouble($code);
        |      }
        |      if ($s > $best || Double.isNaN($s)) $best = $s;
        |    }
        |    $total += $best;
        |  }
        |  ${ev.value} = $total;
        |}
      """.stripMargin
    })

  override def prettyName: String = "maxsim_adc"

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
  def maxSimFast(q: Column, d: Column): Column =
    GraftColumnBridge.column(
      MaxSimExpr(GraftColumnBridge.expression(q), GraftColumnBridge.expression(d))
    )
  def maxSimAdcFast(qlut: Column, dcodes: Column): Column =
    GraftColumnBridge.column(
      MaxSimAdcExpr(
        GraftColumnBridge.expression(qlut), GraftColumnBridge.expression(dcodes))
    )
  def bitSignDotFast(words: Column, rq: Column): Column =
    GraftColumnBridge.column(
      BitSignDotExpr(
        GraftColumnBridge.expression(words), GraftColumnBridge.expression(rq))
    )
}
