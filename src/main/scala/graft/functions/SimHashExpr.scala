package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a space-tokenized document in ONE pass — bit b of
  * the signature is set when the sum over tokens of ±1 (sign of bit b of
  * the token's 64-bit hash = first 8 md5 bytes, big-endian) is >= 0.
  *
  * This is the map-only replacement for the explode + 64-column
  * sum-aggregate spelling: the signature is a PER-DOC scalar, so there is
  * nothing to shuffle — one md5 per token inside the row's own eval, no
  * token row-explosion, no aggregation exchange. At corpus scale the old
  * shape shuffled one row per TOKEN into a 64-wide hash-agg; this shape
  * shuffles nothing at all. The arithmetic is bit-for-bit the aggregate
  * spelling (integer ± sums commute), so results are hash-identical —
  * the DuckDB oracle keeps its sum-over-bits CTE formulation.
  *
  * Token hash = first 16 hex chars of md5 interpreted as a signed 64-bit
  * value (big-endian bytes), matching
  * `conv(substring(md5(w), 1, 16), 16, 10)` semantics without the
  * unsigned-overflow hazards of a string conv.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  // covariant override (see VectorBinaryExpression)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(t: Any): Any =
    SimHash64Expr.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the kernel is digest-bound, not expression-bound — a static call
    // keeps the surrounding whole-stage codegen span intact
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.compute($c)")

  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  // one digest per executor thread: MessageDigest is stateful and
  // per-call getInstance would dominate short tokens
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = computeSig(s.toString)

  /** The raw kernel, shared with the streaming twin
    * (StreamingOps.simhashDedupStream) so batch and stream signatures are
    * bit-for-bit identical by construction. Tokenization is
    * `split(" ", -1)` — the same single-space regex, trailing empties
    * kept, as the SQL `split(text, ' ')` both engines spell.
    */
  def computeSig(text: String): Long = {
    val md = mdLocal.get()
    val sums = new Array[Int](64)
    text.split(" ", -1).foreach { w =>
      md.reset()
      val d = md.digest(w.getBytes(StandardCharsets.UTF_8))
      var x = 0L
      var i = 0
      while (i < 8) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        sums(b) += (if (((x >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (sums(b) >= 0) sim |= (1L << b); b += 1 }
    sim
  }

  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(text)))
}
