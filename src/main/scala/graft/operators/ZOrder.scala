package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional table-layout
  * primitive: interleave the bits of two sort keys so that range
  * predicates on EITHER dimension prune contiguous z-ranges, giving
  * min/max data skipping on both columns from one physical sort order
  * (the layout trick behind Delta/Iceberg `ZORDER BY`).
  *
  * The interleave is pure column bit-arithmetic (the classic
  * shift-or-mask bit-spread), so it stays inside whole-stage codegen and
  * is portable to any engine with 64-bit integer ops — no UDF anywhere.
  * Clustering = `repartitionByRange` on the z-value: a range shuffle over
  * sampled split points, exactly as scalable as any global sort, followed
  * by within-partition sort so parquet row-group min/max stats align with
  * z-ranges.
  */
object ZOrder {

  /** Spread the low 31 bits of `x` to the even bit positions (0,2,4,…) of
    * a 64-bit value — the standard mask chain.
    */
  def spreadBits(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x3333333333333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton code: x on even bits, y on odd bits. Both inputs must be
    * non-negative and < 2³¹ (the caller normalizes); the result is then
    * a non-negative BIGINT whose ordering is the z-curve.
    */
  def zvalue2(x: Column, y: Column): Column =
    spreadBits(x.cast("long"))
      .bitwiseOR(shiftleft(spreadBits(y.cast("long")), 1))

  /** Cluster `df` on the z-curve of two key columns: range-partition on
    * the z-value (sampled split points — no single-partition sort), then
    * sort within partitions so file/row-group min-max stats on BOTH keys
    * are tight. Write the result with any sink; scans filtering either
    * key then skip non-overlapping row groups.
    */
  def clusterByZ(
      df: DataFrame,
      xCol: String,
      yCol: String,
      numPartitions: Int
  ): DataFrame = {
    val z = zvalue2(col(xCol), col(yCol)).as("z")
    df.withColumn("z", z)
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
  }
}
