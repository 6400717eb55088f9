package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded max-heap of (dist, id) pairs keeping the k smallest under the
  * ordering (dist asc, id asc). ~k entries per aggregation buffer — this is
  * what makes 100 TB top-k work: each partition reduces to k rows before
  * the shuffle (partial aggregation), instead of sorting |Q|·|B| rows under
  * a rank window (SURVEY.md §4.2, §7.3.5; semantics of
  * py/bruteforce.py:17-18 sort+slice).
  */
final class TopKBuffer(val k: Int) {
  // max-heap: root = worst kept entry under (dist, id)
  val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    new java.util.Comparator[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }
  )

  def add(dist: Double, id: Long): Unit = {
    if (heap.size < k) heap.add((dist, id))
    else {
      val worst = heap.peek()
      if (dist < worst._1 || (dist == worst._1 && id < worst._2)) {
        heap.poll()
        heap.add((dist, id))
      }
    }
  }

  def sortedEntries: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    scala.util.Sorting.stableSort(
      arr,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    )
    arr
  }
}

/** Aggregate function `graft_topk(dist, id)`: the k smallest (dist, id)
  * pairs per group as `array<struct<dist double, id bigint>>` ascending.
  * Inputs implicitly cast to (double, bigint) at analysis; non-numeric
  * arguments are an analysis-time error. `k` must be a positive literal
  * integer (validated at function-resolution time in
  * [[graft.GraftExtensions]]).
  */
case class TopKAgg(
    dist: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k >= 1, s"graft_topk: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(dist, id)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dist", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false)
    )),
    containsNull = false
  )

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      buf.add(d.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val (d, i) = it.next()
      buf.add(d, i)
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val entries = buf.sortedEntries
    new GenericArrayData(entries.map { case (d, i) =>
      InternalRow(d, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val entries = buf.sortedEntries
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (d, i) => bb.putDouble(d); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) {
      buf.add(bb.getDouble, bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Column: k smallest (dist, id) pairs ascending, as an aggregate. */
  def topK(distCol: Column, idCol: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(
        GraftColumnBridge.expression(distCol),
        GraftColumnBridge.expression(idCol),
        k
      ).toAggregateExpression()
    )
}
