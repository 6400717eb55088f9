package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: bit i of x to position 2i, bit i of y to 2i+1. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue2 equals the bit-by-bit reference interleave") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(2000)(
      (rng.nextInt(Int.MaxValue).toLong, rng.nextInt(Int.MaxValue).toLong)
    ) ++ Seq((0L, 0L), (Int.MaxValue.toLong, Int.MaxValue.toLong), (1L, 0L),
      (0L, 1L))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue2(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == mortonRef(x, y), s"x=$x y=$y")
      assert(z >= 0L)
    }
  }

  test("zvalue2 is monotone in each coordinate when the other is fixed") {
    // fixing y, increasing x increases z (x occupies the even bits)
    val rng = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val y = rng.nextInt(Int.MaxValue).toLong
      val x1 = rng.nextInt(Int.MaxValue - 1).toLong
      val x2 = x1 + 1 + rng.nextInt(1000)
      assert(mortonRef(x1, y) < mortonRef(x2, y))
      assert(mortonRef(y, x1) < mortonRef(y, x2))
    }
  }

  test("clusterByZ yields non-overlapping per-partition z ranges") {
    val rng = new scala.util.Random(13)
    val df = Seq.fill(5000)(
      (rng.nextInt(1 << 20).toLong, rng.nextInt(1 << 20).toLong)
    ).toDF("x", "y")
    val ranges = ZOrder.clusterByZ(df, "x", "y", 8)
      .select(spark_partition_id().as("p"), col("z"))
      .groupBy(col("p"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .orderBy(col("lo"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _                         =>
    }
  }
}
