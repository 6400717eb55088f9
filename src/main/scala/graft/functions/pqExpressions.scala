package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, ShortType}

/** Native Catalyst expressions for the PQ kernels (ref semantics:
  * py/pq.py:242-349). The codebook rides along as a flat `double[]`
  * reference object — (M, K, D') row-major, `(mi*K + ki)*D' + j` — so the
  * generated code indexes primitives directly: no per-row `Seq` boxing, no
  * broadcast dereference per row, and the whole projection stays inside
  * whole-stage codegen. Spark ships the task binary (expression tree
  * included) via its own torrent broadcast, so a codebook-sized array in
  * the plan costs one broadcast per stage — same wire cost as an explicit
  * `Broadcast[PQModel]`, without leaving codegen.
  *
  * Accumulation orders are part of the observable contract (oracle queries
  * hash results at 6 decimals); ONE order is used engine-wide, pinned by
  * PQExpressionsSpec's bit-equality cases against [[graft.operators.PQModel]]:
  *  - encode: per-subspace argmin, first-lowest-index tie-break
  *    (py/pq.py:242-274) — integer output, no FP ambiguity.
  *  - sdc: one running sum across all D dimensions in (subspace, dim)
  *    order — identical to l2²(decode(a), decode(b)) summed left-to-right,
  *    exactly like [[graft.operators.PQModel.sdc]].
  *  - adc: per-subspace partial sums added in subspace order — the ONLY
  *    order under which the lookup-table path ([[PQLutExpr]] +
  *    [[PQAdcLutExpr]], the reference's batch tactic,
  *    py/PRODUCT_QUANTIZATION.md:157-169) is bit-identical to the direct
  *    path ([[PQAdcExpr]]); [[graft.operators.PQModel.adc]] uses the same
  *    order.
  *
  * Every expression validates input types at analysis time
  * (`checkInputDataTypes`) and array lengths at runtime — a wrong-length
  * vector raises a descriptive error instead of an out-of-bounds Unsafe
  * read (getDouble past numElements is undefined memory, not an exception).
  */
trait PQModelExpression {
  def flat: Array[Double]
  def m: Int
  def k: Int
  def dp: Int

  /** Register the flat codebook once per generated class. */
  protected def cbRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("pqCodebook", flat, "double[]")
}

private[functions] object PQCheck {
  val helper = "graft.functions.PQCheck"

  def requireLen(a: ArrayData, expected: Int, what: String, name: String): Unit =
    if (a.numElements() != expected)
      throw new IllegalArgumentException(
        s"$name: expected $what of length $expected, got ${a.numElements()}")

  /** Codegen twin of [[requireLen]] (static call keeps generated code small). */
  def checkLen(n: Int, expected: Int, what: String, name: String): Unit =
    if (n != expected)
      throw new IllegalArgumentException(
        s"$name: expected $what of length $expected, got $n")

  def vecType(dt: DataType, name: String, side: String = "input"): TypeCheckResult =
    dt match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> $side, got ${other.catalogString}")
    }

  def codeType(dt: DataType, name: String, side: String = "input"): TypeCheckResult =
    dt match {
      case ArrayType(ShortType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<smallint> $side, got ${other.catalogString}")
    }
}

/** PQ encode: array<double> vector -> array<short> code (one per subspace). */
case class PQEncodeExpr(child: Expression, flat: Array[Double], m: Int, k: Int, dp: Int)
    extends UnaryExpression with PQModelExpression {

  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def prettyName: String = "pq_encode_native"

  override def checkInputDataTypes(): TypeCheckResult =
    PQCheck.vecType(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    PQCheck.requireLen(v, m * dp, "vector", prettyName)
    val out = new Array[Short](m)
    var mi = 0
    while (mi < m) {
      val off = mi * dp
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val coff = (mi * k + ki) * dp
        var s = 0.0
        var j = 0
        while (j < dp) { val d = v.getDouble(off + j) - flat(coff + j); s += d * d; j += 1 }
        if (s < bestD) { bestD = s; best = ki }
        ki += 1
      }
      out(mi) = best.toShort
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = cbRef(ctx)
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val coff = ctx.freshName("coff")
      s"""
        |${PQCheck.helper}.checkLen($a.numElements(), ${m * dp}, "vector", "$prettyName");
        |short[] $out = new short[$m];
        |for (int $mi = 0; $mi < $m; $mi++) {
        |  int $best = 0; double $bestD = Double.MAX_VALUE;
        |  for (int $ki = 0; $ki < $k; $ki++) {
        |    int $coff = ($mi * $k + $ki) * $dp;
        |    double $s = 0.0;
        |    for (int $j = 0; $j < $dp; $j++) {
        |      double $d = $a.getDouble($mi * $dp + $j) - $cb[$coff + $j];
        |      $s += $d * $d;
        |    }
        |    if ($s < $bestD) { $bestD = $s; $best = $ki; }
        |  }
        |  $out[$mi] = (short) $best;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ decode: array<short> code -> reconstructed array<double> vector. */
case class PQDecodeExpr(child: Expression, flat: Array[Double], m: Int, k: Int, dp: Int)
    extends UnaryExpression with PQModelExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode_native"

  override def checkInputDataTypes(): TypeCheckResult =
    PQCheck.codeType(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val c = input.asInstanceOf[ArrayData]
    PQCheck.requireLen(c, m, "code", prettyName)
    val out = new Array[Double](m * dp)
    var mi = 0
    while (mi < m) {
      val coff = (mi * k + c.getShort(mi)) * dp
      var j = 0
      while (j < dp) { out(mi * dp + j) = flat(coff + j); j += 1 }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = cbRef(ctx)
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val coff = ctx.freshName("coff")
      s"""
        |${PQCheck.helper}.checkLen($a.numElements(), $m, "code", "$prettyName");
        |double[] $out = new double[${m * dp}];
        |for (int $mi = 0; $mi < $m; $mi++) {
        |  int $coff = ($mi * $k + $a.getShort($mi)) * $dp;
        |  for (int $j = 0; $j < $dp; $j++) {
        |    $out[$mi * $dp + $j] = $cb[$coff + $j];
        |  }
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric distance: raw array<double> query vs array<short> code.
  * Per-subspace partial sums, added in subspace order (see file doc).
  */
case class PQAdcExpr(left: Expression, right: Expression,
                     flat: Array[Double], m: Int, k: Int, dp: Int)
    extends BinaryExpression with PQModelExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_native"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = PQCheck.vecType(left.dataType, prettyName, "query (left)")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else PQCheck.codeType(right.dataType, prettyName, "code (right)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    PQCheck.requireLen(v, m * dp, "query vector", prettyName)
    PQCheck.requireLen(c, m, "code", prettyName)
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val coff = (mi * k + c.getShort(mi)) * dp
      val off = mi * dp
      var sub = 0.0
      var j = 0
      while (j < dp) { val d = v.getDouble(off + j) - flat(coff + j); sub += d * d; j += 1 }
      s += sub
      mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cb = cbRef(ctx)
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val coff = ctx.freshName("coff")
      s"""
        |${PQCheck.helper}.checkLen($a.numElements(), ${m * dp}, "query vector", "$prettyName");
        |${PQCheck.helper}.checkLen($b.numElements(), $m, "code", "$prettyName");
        |double $s = 0.0;
        |for (int $mi = 0; $mi < $m; $mi++) {
        |  int $coff = ($mi * $k + $b.getShort($mi)) * $dp;
        |  double $sub = 0.0;
        |  for (int $j = 0; $j < $dp; $j++) {
        |    double $d = $a.getDouble($mi * $dp + $j) - $cb[$coff + $j];
        |    $sub += $d * $d;
        |  }
        |  $s += $sub;
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric distance: code vs code through centroids. One running sum in
  * dimension order — exactly [[graft.operators.PQModel.sdc]]'s accumulation.
  */
case class PQSdcExpr(left: Expression, right: Expression,
                     flat: Array[Double], m: Int, k: Int, dp: Int)
    extends BinaryExpression with PQModelExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_sdc_native"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = PQCheck.codeType(left.dataType, prettyName, "code (left)")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else PQCheck.codeType(right.dataType, prettyName, "code (right)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    PQCheck.requireLen(x, m, "code", prettyName)
    PQCheck.requireLen(y, m, "code", prettyName)
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val ca = (mi * k + x.getShort(mi)) * dp
      val cb = (mi * k + y.getShort(mi)) * dp
      var j = 0
      while (j < dp) { val d = flat(ca + j) - flat(cb + j); s += d * d; j += 1 }
      mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cb = cbRef(ctx)
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val ca = ctx.freshName("ca")
      val cbo = ctx.freshName("cbo")
      s"""
        |${PQCheck.helper}.checkLen($a.numElements(), $m, "code", "$prettyName");
        |${PQCheck.helper}.checkLen($b.numElements(), $m, "code", "$prettyName");
        |double $s = 0.0;
        |for (int $mi = 0; $mi < $m; $mi++) {
        |  int $ca = ($mi * $k + $a.getShort($mi)) * $dp;
        |  int $cbo = ($mi * $k + $b.getShort($mi)) * $dp;
        |  for (int $j = 0; $j < $dp; $j++) {
        |    double $d = $cb[$ca + $j] - $cb[$cbo + $j];
        |    $s += $d * $d;
        |  }
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-query ADC lookup table (the reference's batch tactic,
  * py/PRODUCT_QUANTIZATION.md:157-169): array<double> of length M*K where
  * `lut[mi*K + ki]` = L2² between the query's subspace-mi slice and
  * codebook centroid (mi, ki). Computed ONCE per query row; each
  * query-code distance then costs M array lookups ([[PQAdcLutExpr]])
  * instead of M*D' multiply-adds — the win when one query scans many codes.
  * Each cell uses the same per-subspace accumulation as [[PQAdcExpr]], so
  * LUT distances are bit-identical to direct ADC.
  */
case class PQLutExpr(child: Expression, flat: Array[Double], m: Int, k: Int, dp: Int)
    extends UnaryExpression with PQModelExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    PQCheck.vecType(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    PQCheck.requireLen(v, m * dp, "query vector", prettyName)
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val off = mi * dp
      var ki = 0
      while (ki < k) {
        val coff = (mi * k + ki) * dp
        var s = 0.0
        var j = 0
        while (j < dp) { val d = v.getDouble(off + j) - flat(coff + j); s += d * d; j += 1 }
        out(mi * k + ki) = s
        ki += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = cbRef(ctx)
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val coff = ctx.freshName("coff")
      s"""
        |${PQCheck.helper}.checkLen($a.numElements(), ${m * dp}, "query vector", "$prettyName");
        |double[] $out = new double[${m * k}];
        |for (int $mi = 0; $mi < $m; $mi++) {
        |  for (int $ki = 0; $ki < $k; $ki++) {
        |    int $coff = ($mi * $k + $ki) * $dp;
        |    double $s = 0.0;
        |    for (int $j = 0; $j < $dp; $j++) {
        |      double $d = $a.getDouble($mi * $dp + $j) - $cb[$coff + $j];
        |      $s += $d * $d;
        |    }
        |    $out[$mi * $k + $ki] = $s;
        |  }
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC via a precomputed lookup table: sum over subspaces of
  * `lut[mi*K + code[mi]]` — M lookups per distance, no codebook access.
  * Bit-identical to [[PQAdcExpr]] on the same (query, code) pair.
  */
case class PQAdcLutExpr(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_from_lut"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = PQCheck.vecType(left.dataType, prettyName, "lut (left)")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else PQCheck.codeType(right.dataType, prettyName, "code (right)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    PQCheck.requireLen(lut, m * k, "lut", prettyName)
    PQCheck.requireLen(c, m, "code", prettyName)
    var s = 0.0
    var mi = 0
    while (mi < m) { s += lut.getDouble(mi * k + c.getShort(mi)); mi += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val mi = ctx.freshName("mi")
      s"""
        |${PQCheck.helper}.checkLen($a.numElements(), ${m * k}, "lut", "$prettyName");
        |${PQCheck.helper}.checkLen($b.numElements(), $m, "code", "$prettyName");
        |double $s = 0.0;
        |for (int $mi = 0; $mi < $m; $mi++) {
        |  $s += $a.getDouble($mi * $k + $b.getShort($mi));
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
