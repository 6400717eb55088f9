package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: per-dimension linear 8-bit codes — the second
  * [[VectorCompression]] implementation behind the reference's pluggable
  * codec boundary (ref: py/vector_compression.py:13-94 defines the
  * interface; PQ is its only shipped codec, SQ8 is the other standard
  * memory/recall point: D bytes per vector, ~8× smaller than doubles,
  * near-lossless recall because every dimension keeps 256 levels).
  *
  * Training is a single distributed min/max aggregate per dimension
  * (partial aggregation map-side, a ≤ 32·D-row shuffle regardless of
  * corpus size) and is fully deterministic — so unlike PQ's seeded
  * k-means, the ENTIRE pipeline (train → encode → reconstruct → search)
  * is DuckDB-oracle-checkable, which is exactly what sq_encode and
  * sq_adc_topk do.
  *
  * Quantization rule, pinned identically in Scala and the SQL oracle
  * (same IEEE-754 op order, so bit-identical):
  *   code[j] = clamp(floor((v[j] − lo[j]) / span[j] · 255 + 0.5), 0, 255)
  *   decode[j] = lo[j] + code[j] / 255 · span[j]
  * Degenerate dimensions (span ≤ 0) encode to 0 and decode to lo[j].
  */
final case class SQModel(lo: Array[Double], hi: Array[Double]) {
  require(lo.length == hi.length, "lo/hi dimension mismatch")
  val d: Int = lo.length

  def encodeVec(v: Array[Double]): Array[Short] = {
    require(v.length == d, s"vector dim ${v.length} != model dim $d")
    val out = new Array[Short](d)
    var j = 0
    while (j < d) {
      val span = hi(j) - lo(j)
      val c =
        if (span <= 0.0) 0.0
        else math.floor((v(j) - lo(j)) / span * 255.0 + 0.5)
      out(j) = math.max(0.0, math.min(255.0, c)).toShort
      j += 1
    }
    out
  }

  def decodeCode(code: Array[Short]): Array[Double] = {
    require(code.length == d, s"code dim ${code.length} != model dim $d")
    val out = new Array[Double](d)
    var j = 0
    while (j < d) {
      out(j) = lo(j) + code(j) / 255.0 * (hi(j) - lo(j))
      j += 1
    }
    out
  }

  /** Asymmetric distance: raw query vs reconstructed code, accumulated in
    * dimension order (the engine-wide left-to-right contract the oracles
    * mirror).
    */
  def adc(q: Array[Double], code: Array[Short]): Double = {
    var s = 0.0
    var j = 0
    while (j < d) {
      val df = q(j) - (lo(j) + code(j) / 255.0 * (hi(j) - lo(j)))
      s += df * df
      j += 1
    }
    s
  }

  /** Symmetric distance: code vs code through reconstructions. */
  def sdc(a: Array[Short], b: Array[Short]): Double = {
    var s = 0.0
    var j = 0
    while (j < d) {
      val span = hi(j) - lo(j)
      val df = (a(j) - b(j)) / 255.0 * span
      s += df * df
      j += 1
    }
    s
  }
}

object ScalarQuantizer {

  /** Train = per-dimension min/max over the corpus: posexplode to
    * (dimension, value), one hash aggregate (map-side partial min/max
    * combine, so the shuffle is ≤ partitions·D rows however large the
    * corpus), collect D rows.
    */
  def train(df: DataFrame, vecCol: String): SQModel = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()
    require(rows.nonEmpty, "SQ train on empty data")
    val d = rows.map(_.getInt(0)).max + 1
    val lo = new Array[Double](d)
    val hi = new Array[Double](d)
    rows.foreach { r =>
      lo(r.getInt(0)) = r.getDouble(1)
      hi(r.getInt(0)) = r.getDouble(2)
    }
    SQModel(lo, hi)
  }

  /** Bulk encode: (id, code) via a partition-batched kernel — one
    * broadcast model reference per partition, primitive arrays end to end
    * (the SQ analog of [[ProductQuantizer.encodePartitioned]]).
    */
  def encodePartitioned(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: SQModel
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
      .toDF(idCol, "code")
  }

  /** Column: reconstructed array<double> from an array<smallint> code
    * column — declarative (builtin `transform` over plan-embedded lo/hi
    * literals), same op order as [[SQModel.decodeCode]], so downstream
    * distances bit-match the kernels and the SQL oracle.
    */
  def decodeCol(model: SQModel, code: Column): Column = {
    val loC = typedLit(model.lo.toSeq)
    val hiC = typedLit(model.hi.toSeq)
    transform(code, (c, j) => {
      val lo = element_at(loC, (j + 1).cast("int"))
      val hi = element_at(hiC, (j + 1).cast("int"))
      lo + c.cast("double") / lit(255.0) * (hi - lo)
    })
  }
}

/** SQ8-backed compression: plugs into the same [[VectorCompression]]
  * boundary as [[PQCompression]], so HNSW builds/searches and the shard
  * code table work unchanged (ref: py/vector_compression.py:97-135 —
  * same shape, different codec).
  */
final class SQCompression(val model: SQModel) extends VectorCompression {
  def encode(v: Array[Double]): Array[Short] = model.encodeVec(v)
  def decode(code: Array[Short]): Array[Double] = model.decodeCode(code)
  def distance(a: Array[Short], b: Array[Short]): Double = model.sdc(a, b)
  def queryDistance(q: Array[Double], code: Array[Short]): Double =
    model.adc(q, code)
}
