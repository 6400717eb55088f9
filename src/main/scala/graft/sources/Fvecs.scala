package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `.fvecs` source/sink (SURVEY.md §2 A1): the SIFT benchmark format read
  * by the reference's evaluation notebook (py/hnsw.ipynb cell-1) — per row
  * a little-endian int32 dimension header followed by dim float32s.
  *
  * Read path: `binaryFile` data source (one task per file, whole-file
  * bytes) decoded in a map — row ids are the position within the file, and
  * a multi-file load offsets ids by lexicographic file order so the id
  * space stays dense `0..N-1` like the reference's in-memory store
  * (py/hnsw.py:344). For 100 TB-scale vector data the right landing format
  * is Parquet (columnar, splittable, predicate-pushdown); this source
  * exists to ingest upstream fvecs artifacts into that layout.
  */
object Fvecs {

  /** Shared two-pass read for the *vecs family, generic over the per-row
    * payload: (1) per-file row counts (only tiny (path, count) pairs reach
    * the driver), (2) decode with dense ids offset by lexicographic file
    * order. File contents never move through the driver.
    */
  private[sources] def readVecs[T](
      spark: SparkSession,
      path: String,
      decode: Array[Byte] => Iterator[T]
  )(implicit enc: org.apache.spark.sql.Encoder[(Long, T)]): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val counts = files
      .map { case (p, bytes) => (p, decode(bytes).size.toLong) }
      .collect()
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
      .toMap
    val bcOff = spark.sparkContext.broadcast(offsets)
    files
      .flatMap { case (p, bytes) =>
        val off = bcOff.value(p)
        decode(bytes).zipWithIndex.map { case (v, i) => (off + i, v) }
      }(enc)
      .toDF("id", "vec")
  }

  def decode(bytes: Array[Byte]): Iterator[Array[Float]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[Array[Float]] {
      def hasNext: Boolean = buf.remaining() >= 4
      def next(): Array[Float] = {
        val d = buf.getInt()
        require(d > 0 && buf.remaining() >= 4 * d, s"corrupt fvecs row, dim=$d")
        val v = new Array[Float](d)
        var i = 0
        while (i < d) { v(i) = buf.getFloat(); i += 1 }
        v
      }
    }
  }

  /** Read one or many fvecs files as (id long, vec array<float>). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readVecs(spark, path, decode)
  }

  /** Write (id, vec) rows to a single fvecs file in ascending-id order.
    * TEST/ROUND-TRIP UTILITY ONLY: the single-file format forces a
    * driver-side collect, so the row count is guarded — corpus-scale
    * vector data belongs in parquet (`df.write.parquet`), not fvecs.
    */
  def write(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      maxRows: Int = 1000000
  ): Unit = {
    val n = df.count()
    require(n <= maxRows,
      s"Fvecs.write collects to the driver and refuses $n > $maxRows rows; " +
        "write corpus-scale vectors as parquet instead (raise maxRows to force)")
    val rows = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .collect()
      .sortBy(_.getLong(0))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    )
    try {
      rows.foreach { r =>
        val v = r.getSeq[Float](1)
        val buf = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(v.length)
        v.foreach(buf.putFloat)
        out.write(buf.array())
      }
    } finally out.close()
  }
}

/** `.ivecs` source/sink: same layout as fvecs with an int32 payload — the
  * SIFT benchmarks ship ground-truth neighbor lists in this format, so an
  * evaluation flow like the reference notebook's (py/hnsw.ipynb cell-1/6)
  * reads base/query vectors from fvecs and the expected ids from ivecs.
  */
object Ivecs {

  def decode(bytes: Array[Byte]): Iterator[Array[Int]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[Array[Int]] {
      def hasNext: Boolean = buf.remaining() >= 4
      def next(): Array[Int] = {
        val d = buf.getInt()
        require(d > 0 && buf.remaining() >= 4 * d, s"corrupt ivecs row, dim=$d")
        val v = new Array[Int](d)
        var i = 0
        while (i < d) { v(i) = buf.getInt(); i += 1 }
        v
      }
    }
  }

  /** Read one or many ivecs files as (id long, vec array<int>). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Fvecs.readVecs(spark, path, decode)
  }

  /** Single-file sink, ascending-id order (test/round-trip utility — same
    * driver-collect guard rationale as [[Fvecs.write]]).
    */
  def write(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      maxRows: Int = 1000000
  ): Unit = {
    val n = df.count()
    require(n <= maxRows,
      s"Ivecs.write collects to the driver and refuses $n > $maxRows rows; " +
        "write corpus-scale data as parquet instead (raise maxRows to force)")
    val rows = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<int>"))
      .collect()
      .sortBy(_.getLong(0))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    )
    try {
      rows.foreach { r =>
        val v = r.getSeq[Int](1)
        val buf = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(v.length)
        v.foreach(buf.putInt)
        out.write(buf.array())
      }
    } finally out.close()
  }
}

/** `.bvecs` source/sink: same layout with a uint8 payload (the SIFT1B
  * billion-vector distribution format). Values widen to smallint 0..255 —
  * the same representation the SQ8 code tables use.
  */
object Bvecs {

  def decode(bytes: Array[Byte]): Iterator[Array[Short]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[Array[Short]] {
      def hasNext: Boolean = buf.remaining() >= 4
      def next(): Array[Short] = {
        val d = buf.getInt()
        require(d > 0 && buf.remaining() >= d, s"corrupt bvecs row, dim=$d")
        val v = new Array[Short](d)
        var i = 0
        while (i < d) { v(i) = (buf.get() & 0xff).toShort; i += 1 }
        v
      }
    }
  }

  /** Read one or many bvecs files as (id long, vec array<smallint>). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Fvecs.readVecs(spark, path, decode)
  }

  /** Single-file sink, ascending-id order; values must be in 0..255. */
  def write(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      maxRows: Int = 1000000
  ): Unit = {
    val n = df.count()
    require(n <= maxRows,
      s"Bvecs.write collects to the driver and refuses $n > $maxRows rows; " +
        "write corpus-scale data as parquet instead (raise maxRows to force)")
    val rows = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<smallint>"))
      .collect()
      .sortBy(_.getLong(0))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    )
    try {
      rows.foreach { r =>
        val v = r.getSeq[Short](1)
        v.foreach { x =>
          require(x >= 0 && x <= 255, s"bvecs value $x outside 0..255")
        }
        val buf = ByteBuffer.allocate(4 + v.length).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(v.length)
        v.foreach(x => buf.put(x.toByte))
        out.write(buf.array())
      }
    } finally out.close()
  }
}
