package graft.functions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Accumulator for the upper-triangle second raw moments of a d-dim
  * vector column: d(d+1)/2 cells, each the EXACT sum of the per-row
  * products cast to DECIMAL(18,14) (the same `Cast(double → decimal)`
  * rounding Spark's `sum(col.cast(...))` applies, via
  * [[org.apache.spark.sql.types.Decimal]] itself — so the result is
  * bit-identical to the explode + groupBy + decimal-sum spelling and to
  * DuckDB's `sum((x·y)::DECIMAL(18,14))` replay).
  *
  * Hot-path state is a flat Array[Long] of unscaled 10^-14 units — one
  * long add per cell per row, no BigDecimal allocation, no per-pair
  * rows. Pending longs fold into BigInteger cells every FLUSH_ROWS rows;
  * each add is overflow-checked, and a cell whose pending long would
  * wrap spills to its BigInteger total immediately, so the exact sum is
  * safe for ANY |x_i·x_j| that fits DECIMAL(18,14) — the periodic flush
  * is an amortization, not the correctness guard.
  */
final class CovMomentsBuffer(val cells: Int) {
  val pending = new Array[Long](cells)
  val total = Array.fill[BigInteger](cells)(BigInteger.ZERO)
  var rowsSinceFlush = 0

  def flush(): Unit = {
    var i = 0
    while (i < cells) {
      if (pending(i) != 0L) {
        total(i) = total(i).add(BigInteger.valueOf(pending(i)))
        pending(i) = 0L
      }
      i += 1
    }
    rowsSinceFlush = 0
  }
}

/** Aggregate `graft_cov_moments(vec)`: exact DECIMAL(38,14) sums of the
  * upper-triangle products x_i·x_j (j >= i, row-major) of an
  * array<double> column — the one-pass, constant-state kernel behind
  * [[graft.operators.Pca.moments]]. Partial state is d(d+1)/2 numbers
  * (~16 KiB at d=64) independent of the corpus size; the shuffle carries
  * one buffer per partition instead of N·d(d+1)/2 exploded pair rows.
  */
case class CovMomentsAgg(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CovMomentsBuffer] {

  private val cells = d * (d + 1) / 2
  private val FLUSH_ROWS = 16384

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 14), containsNull = false)

  override def createAggregationBuffer(): CovMomentsBuffer =
    new CovMomentsBuffer(cells)

  override def update(buf: CovMomentsBuffer, input: InternalRow): CovMomentsBuffer = {
    val a = vec.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData].toDoubleArray()
      require(arr.length == d,
        s"graft_cov_moments: expected $d dims, got ${arr.length}")
      var idx = 0
      var i = 0
      while (i < d) {
        val xi = arr(i)
        var j = i
        while (j < d) {
          // identical rounding to Cast(double -> DECIMAL(18,14))
          val dec = Decimal(xi * arr(j))
          if (!dec.changePrecision(18, 14)) {
            throw new ArithmeticException(
              s"graft_cov_moments: |x_i*x_j| overflows DECIMAL(18,14)")
          }
          val u = dec.toUnscaledLong
          val p = buf.pending(idx)
          val s = p + u
          if (((p ^ s) & (u ^ s)) < 0L) {
            // pending long would wrap: spill this cell to its exact total
            buf.total(idx) = buf.total(idx).add(BigInteger.valueOf(p))
            buf.pending(idx) = u
          } else {
            buf.pending(idx) = s
          }
          idx += 1
          j += 1
        }
        i += 1
      }
      buf.rowsSinceFlush += 1
      if (buf.rowsSinceFlush >= FLUSH_ROWS) buf.flush()
    }
    buf
  }

  override def merge(buf: CovMomentsBuffer, other: CovMomentsBuffer): CovMomentsBuffer = {
    other.flush()
    var i = 0
    while (i < cells) {
      buf.total(i) = buf.total(i).add(other.total(i))
      i += 1
    }
    buf
  }

  override def eval(buf: CovMomentsBuffer): Any = {
    buf.flush()
    new GenericArrayData(buf.total.map { bi =>
      Decimal(new java.math.BigDecimal(bi, 14), 38, 14)
    }.toArray[Any])
  }

  override def serialize(buf: CovMomentsBuffer): Array[Byte] = {
    buf.flush()
    val parts = buf.total.map(_.toByteArray)
    val bb = ByteBuffer.allocate(4 + parts.map(4 + _.length).sum)
    bb.putInt(parts.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovMomentsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new CovMomentsBuffer(cells)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val p = new Array[Byte](len)
      bb.get(p)
      buf.total(i) = new BigInteger(p)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

object CovMomentsAgg {

  /** Column: exact upper-triangle moment sums (row-major j >= i) of a
    * d-dim array<double> column, as array<decimal(38,14)>.
    */
  def covMoments(vec: Column, d: Int): Column =
    GraftColumnBridge.column(
      CovMomentsAgg(GraftColumnBridge.expression(vec), d)
        .toAggregateExpression())
}
