package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NumPy `.npy` vector source/sink (format spec v1.0) — the other
  * interchange format of the public ANN-benchmark ecosystem next to the
  * *vecs family (big-ann-benchmarks / DiskANN ship query and ground-truth
  * sets as .npy float32 matrices). Supported payload: 2-D C-order
  * little-endian float32 (`descr: '<f4'`, `fortran_order: False`) — the
  * shape every embedding dump uses; anything else fails loudly rather
  * than decoding garbage.
  *
  * Read path shares [[Fvecs.readVecs]]: `binaryFile` whole-file bytes
  * decoded executor-side, dense ids from lexicographic file order —
  * contents never move through the driver. Same 100-TB positioning as
  * fvecs: this source INGESTS upstream artifacts; the landing format at
  * scale is Parquet.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte,
      'Y'.toByte)

  /** Parse the v1.x header, returning (rows, dim, dataOffset). */
  private[graft] def parseHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 10, "npy: truncated header")
    require(Magic.indices.forall(i => bytes(i) == Magic(i)),
      "npy: bad magic — not a .npy file")
    val major = bytes(6) & 0xff
    require(major == 1, s"npy: unsupported format version $major.x")
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    require(bytes.length >= 10 + hlen, "npy: truncated header dict")
    val header = new String(bytes, 10, hlen, "ASCII")
    require(header.contains("'descr': '<f4'"),
      s"npy: only little-endian float32 ('<f4') is supported, got: $header")
    require(header.contains("'fortran_order': False"),
      s"npy: only C-order arrays are supported, got: $header")
    val shapeRe = "'shape':\\s*\\((\\d+),\\s*(\\d+)\\)".r
    val (n, d) = shapeRe.findFirstMatchIn(header) match {
      case Some(m) => (m.group(1).toInt, m.group(2).toInt)
      case None =>
        throw new IllegalArgumentException(
          s"npy: need a 2-D shape (N, D), got: $header")
    }
    require(bytes.length.toLong - 10 - hlen >= 4L * n * d,
      s"npy: payload shorter than shape ($n, $d)")
    (n, d, 10 + hlen)
  }

  def decode(bytes: Array[Byte]): Iterator[Array[Float]] = {
    val (n, d, off) = parseHeader(bytes)
    val buf = ByteBuffer.wrap(bytes, off, 4 * n * d)
      .order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).iterator.map { _ =>
      val v = new Array[Float](d)
      var i = 0
      while (i < d) { v(i) = buf.getFloat(); i += 1 }
      v
    }
  }

  /** Read one or many .npy files as (id long, vec array<float>). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Fvecs.readVecs(spark, path, decode)
  }

  /** Serialize (rows, dim) float32 C-order to spec-exact v1.0 bytes —
    * byte-identical to `numpy.save` (64-byte-aligned space-padded header,
    * trailing newline; NpySpec pins the golden bytes).
    */
  private[graft] def encodeBytes(
      rows: Seq[Array[Float]], dim: Int): Array[Byte] = {
    rows.foreach(r => require(r.length == dim,
      s"npy: ragged row (${r.length} vs dim $dim)"))
    val dict =
      s"{'descr': '<f4', 'fortran_order': False, " +
        s"'shape': (${rows.length}, $dim), }"
    // total header (magic 6 + version 2 + len 2 + dict + pad + '\n')
    // padded so the data offset is a multiple of 64
    val base = 10 + dict.length + 1
    val pad = (64 - (base % 64)) % 64
    val hlen = dict.length + pad + 1
    val out = ByteBuffer.allocate(10 + hlen + 4 * rows.length * dim)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic)
    out.put(1.toByte).put(0.toByte)
    out.put((hlen & 0xff).toByte).put(((hlen >> 8) & 0xff).toByte)
    out.put(dict.getBytes("ASCII"))
    (0 until pad).foreach(_ => out.put(' '.toByte))
    out.put('\n'.toByte)
    rows.foreach(r => r.foreach(out.putFloat))
    out.array()
  }

  /** Write (id, vec) rows to a single .npy file in ascending-id order.
    * TEST/ROUND-TRIP UTILITY ONLY (driver collect, count-guarded) — the
    * corpus-scale landing format is parquet.
    */
  def write(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      maxRows: Int = 2000000
  ): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .collect()
    require(rows.length <= maxRows,
      s"npy single-file write capped at $maxRows rows, got ${rows.length}")
    val sorted = rows.sortBy(_._1).map(_._2)
    val dim = if (sorted.isEmpty) 0 else sorted.head.length
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path), encodeBytes(sorted.toSeq, dim))
  }
}
