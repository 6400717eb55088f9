package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary (1-bit) quantization: the third [[VectorCompression]] codec
  * behind the reference's pluggable boundary (py/vector_compression.py:13
  * defines the interface; PQ ships with it, SQ8 and BQ are the other two
  * standard memory/recall points). One bit per dimension — D/8 bytes per
  * vector, 64× smaller than doubles — with Hamming distance as the
  * similarity surrogate; the coarsest, fastest rerank-first-stage codec.
  *
  * Training reuses the deterministic per-dimension min/max aggregate of
  * [[ScalarQuantizer.train]] (order-independent, so unlike a mean
  * threshold it is bit-identical across engines and partitionings); the
  * threshold is the mid-range point, pinned with identical IEEE-754 op
  * order in Scala and the SQL oracle:
  *   thr[j] = lo[j] + (hi[j] − lo[j]) / 2
  *   bit[j] = 1 iff v[j] > thr[j]          (strict)
  * Codes pack 16 bits per word, LSB-first within the word, word w holding
  * dimensions [16w, 16w+15]. Hamming(a, b) = Σ_w popcount(a_w xor b_w).
  */
final case class BQModel(lo: Array[Double], hi: Array[Double]) {
  require(lo.length == hi.length, "lo/hi dimension mismatch")
  val d: Int = lo.length
  val words: Int = (d + 15) / 16

  def threshold(j: Int): Double = lo(j) + (hi(j) - lo(j)) / 2.0

  /** Packed sign bits, 16 per word, values in [0, 65535]. */
  def encodeVec(v: Array[Double]): Array[Int] = {
    require(v.length == d, s"vector dim ${v.length} != model dim $d")
    val out = new Array[Int](words)
    var j = 0
    while (j < d) {
      if (v(j) > threshold(j)) out(j / 16) |= 1 << (j % 16)
      j += 1
    }
    out
  }

  def hamming(a: Array[Int], b: Array[Int]): Int = {
    var s = 0
    var w = 0
    while (w < words) {
      s += java.lang.Integer.bitCount(a(w) ^ b(w))
      w += 1
    }
    s
  }
}

object BinaryQuantizer {

  /** Train = the same one-shuffle min/max aggregate as SQ8. */
  def train(df: DataFrame, vecCol: String): BQModel = {
    val sq = ScalarQuantizer.train(df, vecCol)
    BQModel(sq.lo, sq.hi)
  }

  /** Bulk encode: (id, words array<int>) via a partition-batched kernel —
    * the BQ analog of [[ScalarQuantizer.encodePartitioned]].
    */
  def encodePartitioned(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: BQModel
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, v) => (id, m.encodeVec(v)) }
      }
      .toDF(idCol, "words")
  }
}

/** BQ-backed compression: plugs into the same [[VectorCompression]]
  * boundary as [[PQCompression]] / [[SQCompression]], so HNSW
  * builds/searches and the shard code table work unchanged. Codes carry
  * the packed words as shorts (the boundary's code type); Hamming masks
  * the sign extension back off. Decode reconstructs each dimension to the
  * midpoint of its half-range — the best constant under the 1-bit code.
  */
final class BQCompression(val model: BQModel) extends VectorCompression {
  def encode(v: Array[Double]): Array[Short] =
    model.encodeVec(v).map(_.toShort)

  def decode(code: Array[Short]): Array[Double] = {
    val out = new Array[Double](model.d)
    var j = 0
    while (j < model.d) {
      val thr = model.threshold(j)
      out(j) =
        if (((code(j / 16) >> (j % 16)) & 1) == 1) thr + (model.hi(j) - thr) / 2.0
        else model.lo(j) + (thr - model.lo(j)) / 2.0
      j += 1
    }
    out
  }

  def distance(a: Array[Short], b: Array[Short]): Double = {
    var s = 0
    var w = 0
    while (w < a.length) {
      s += java.lang.Integer.bitCount((a(w) ^ b(w)) & 0xFFFF)
      w += 1
    }
    s.toDouble
  }

  def queryDistance(q: Array[Double], code: Array[Short]): Double =
    distance(encode(q), code)
}
