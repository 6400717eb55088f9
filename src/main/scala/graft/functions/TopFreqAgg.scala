package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary with at most `capacity` counters —
  * the mergeable frequent-items sketch (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012): counters add
  * pointwise, then the summary is trimmed back to `capacity` by
  * subtracting the (capacity+1)-largest count from every counter.
  *
  * The buffer tracks `dec`, the total count ever subtracted along this
  * buffer's merge tree. That makes the sketch SELF-VALIDATING:
  * for every item, `est <= true <= est + dec`, and any item with
  * `true > dec` is guaranteed present. A query can therefore join the
  * sketch against an exact aggregate and *prove* the bound held (the
  * q25/q26 construction: the sketch has a correctness role, the output
  * stays exact) — see `text_heavy_hitters`.
  *
  * Scale: the aggregation buffer is O(capacity) regardless of input
  * size, partial aggregation reduces every partition to one summary
  * before the single-row exchange — the reason sketches, not exact
  * groupBys, are how 100-TB pipelines find frequent tokens.
  */
final class MGBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var dec: Long = 0L

  def add(tok: String, by: Long): Unit = {
    if (counts.containsKey(tok)) counts.put(tok, counts.get(tok) + by)
    else if (counts.size < capacity) counts.put(tok, by)
    else {
      // decrement-all by the incoming weight (clamped to the smallest
      // counter so no counter goes negative in the weighted case)
      var d = by
      val it0 = counts.values().iterator()
      while (it0.hasNext) d = math.min(d, it0.next())
      dec += d
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - d
        if (v <= 0L) it.remove() else e.setValue(v)
      }
      val rest = by - d
      if (rest > 0L) {
        if (counts.size < capacity) counts.put(tok, rest)
        else add(tok, rest) // at most one more round: smallest is now > 0
      }
    }
  }

  /** Pointwise-add `other`, then trim back to capacity by subtracting the
    * (capacity+1)-largest value (the mergeable-summaries rule).
    */
  def mergeIn(other: MGBuffer): Unit = {
    dec += other.dec
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val t = vals(vals.length - capacity - 1) // (capacity+1)-largest
      dec += t
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val v = e.getValue - t
        if (v <= 0L) eit.remove() else e.setValue(v)
      }
    }
  }

  /** Entries as (tok, est) sorted by (est desc, tok asc). */
  def sortedEntries: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(
      arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    )
    arr
  }
}

/** Aggregate `graft_topfreq(tok, capacity)` →
  * `struct<dec bigint, items array<struct<tok string, est bigint>>>`:
  * the Misra-Gries summary of a string column plus its accumulated
  * error bound. `capacity` must be a positive literal integer.
  */
case class TopFreqAgg(
    tok: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MGBuffer] with ImplicitCastInputTypes {

  require(capacity >= 1, s"graft_topfreq: capacity must be >= 1, got $capacity")

  override def children: Seq[Expression] = Seq(tok)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("dec", LongType, nullable = false),
    StructField(
      "items",
      ArrayType(
        StructType(Seq(
          StructField("tok", StringType, nullable = false),
          StructField("est", LongType, nullable = false)
        )),
        containsNull = false
      ),
      nullable = false
    )
  ))

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val t = tok.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val items = new GenericArrayData(buf.sortedEntries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toArray[Any])
    InternalRow(buf.dec, items)
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val entries = buf.sortedEntries
    val bytes = entries.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val size = 8 + 4 + bytes.map(b => 4 + 8 + b.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.dec)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MGBuffer(capacity)
    buf.dec = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val est = bb.getLong
      buf.counts.put(new String(arr, StandardCharsets.UTF_8), est)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopFreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopFreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tok = newChildren(0))
}

object TopFreqAgg {

  /** Column: Misra-Gries summary (dec + items) of a string column. */
  def topFreq(tokCol: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      TopFreqAgg(GraftColumnBridge.expression(tokCol), capacity)
        .toAggregateExpression()
    )
}
