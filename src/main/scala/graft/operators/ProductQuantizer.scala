package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PQAdcExpr, PQAdcLutExpr, PQDecodeExpr, PQEncodeExpr, PQLutExpr, PQSdcExpr}

/** Product Quantization per Jégou et al. 2011, with the reference's
  * observable semantics (ref: py/pq.py): D split into M contiguous D'=D/M
  * subspaces (py/pq.py:63-78), per-subspace K-centroid codebooks trained by
  * seeded k-means++/k-means (py/pq.py:208-218), encode = per-subspace argmin
  * centroid (py/pq.py:242-274, first-lowest-index tie-break), decode =
  * centroid concatenation (py/pq.py:276-295), asymmetric distance =
  * sum over subspaces of L2²(query slice, centroid[code]) computing only the
  * M needed cells (py/pq.py:297-324), symmetric = code-to-code centroid
  * distance (py/pq.py:326-349).
  *
  * Spark shape: the model is a small (M, K, D') table — broadcast once and
  * evaluated executor-side; encode/decode/distances are per-row map
  * operations with zero shuffle, so a 100 TB encode is a single scan.
  * Training happens on a seeded sample (the reference's own guidance,
  * py/PRODUCT_QUANTIZATION.md:271-274); each subspace trains independently
  * (the reference's one concurrency boundary, py/pq.py:233-238).
  */
final case class PQModel(
    m: Int,
    k: Int,
    d: Int,
    codebooks: Array[Array[Array[Double]]] // (M, K, D')
) {
  require(d % m == 0, s"D=$d not divisible by M=$m")
  val dp: Int = d / m

  /** Flat (M, K, D') row-major copy — `(mi*K + ki)*D' + j` — the layout the
    * native Catalyst expressions ([[graft.functions.PQEncodeExpr]] etc.)
    * embed as a codegen reference object.
    */
  lazy val flatCodebook: Array[Double] = {
    val out = new Array[Double](m * k * dp)
    var mi = 0
    while (mi < m) {
      var ki = 0
      while (ki < k) {
        System.arraycopy(codebooks(mi)(ki), 0, out, (mi * k + ki) * dp, dp)
        ki += 1
      }
      mi += 1
    }
    out
  }

  def encodeVec(v: Array[Double]): Array[Short] = {
    val out = new Array[Short](m)
    var mi = 0
    while (mi < m) {
      val cb = codebooks(mi)
      val off = mi * dp
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val c = cb(ki)
        var s = 0.0
        var j = 0
        while (j < dp) { val df = v(off + j) - c(j); s += df * df; j += 1 }
        if (s < bestD) { bestD = s; best = ki }
        ki += 1
      }
      out(mi) = best.toShort
      mi += 1
    }
    out
  }

  def decodeCode(code: Array[Short]): Array[Double] = {
    val out = new Array[Double](d)
    var mi = 0
    while (mi < m) {
      System.arraycopy(codebooks(mi)(code(mi).toInt), 0, out, mi * dp, dp)
      mi += 1
    }
    out
  }

  /** Asymmetric distance: raw query vs code — only the M needed centroid
    * cells, never a full M×K table (ref: py/pq.py:313-314). Per-subspace
    * partial sums added in subspace order — the engine-wide ADC
    * accumulation order, chosen because it is the only order under which
    * the LUT batch tactic (py/PRODUCT_QUANTIZATION.md:157-169,
    * [[graft.functions.PQLutExpr]]) is bit-identical to direct ADC; pinned
    * by PQExpressionsSpec.
    */
  def adc(q: Array[Double], code: Array[Short]): Double = {
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val c = codebooks(mi)(code(mi).toInt)
      val off = mi * dp
      var sub = 0.0
      var j = 0
      while (j < dp) { val df = q(off + j) - c(j); sub += df * df; j += 1 }
      s += sub
      mi += 1
    }
    s
  }

  /** The ADC lookup table for one query: `lut(mi*K + ki)` = L2² of the
    * query's subspace-mi slice vs centroid (mi, ki). [[adcFromLut]] over
    * this is bit-identical to [[adc]].
    */
  def adcLut(q: Array[Double]): Array[Double] = {
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val off = mi * dp
      var ki = 0
      while (ki < k) {
        val c = codebooks(mi)(ki)
        var s = 0.0
        var j = 0
        while (j < dp) { val df = q(off + j) - c(j); s += df * df; j += 1 }
        out(mi * k + ki) = s
        ki += 1
      }
      mi += 1
    }
    out
  }

  /** ADC from a precomputed [[adcLut]]: M lookups, no codebook access. */
  def adcFromLut(lut: Array[Double], code: Array[Short]): Double = {
    var s = 0.0
    var mi = 0
    while (mi < m) { s += lut(mi * k + code(mi).toInt); mi += 1 }
    s
  }

  /** Symmetric distance: code vs code through centroids. */
  def sdc(a: Array[Short], b: Array[Short]): Double = {
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val ca = codebooks(mi)(a(mi).toInt)
      val cb = codebooks(mi)(b(mi).toInt)
      var j = 0
      while (j < dp) { val df = ca(j) - cb(j); s += df * df; j += 1 }
      mi += 1
    }
    s
  }
}

object ProductQuantizer {

  /** Train per-subspace codebooks on a seeded sample of `df[vecCol]`.
    * Subspace m gets a derived seed (seed + m) so subspaces are independent
    * (the reference reuses one seed across subspaces, py/pq.py:46-47,94 —
    * deviation noted in SURVEY.md §1.5.7).
    */
  def train(
      df: DataFrame,
      vecCol: String,
      m: Int,
      k: Int,
      seed: Long,
      maxSample: Int = 100000
  ): PQModel =
    fitLocal(sampleRows(df, vecCol, maxSample, seed), m, k, seed)

  /** Seeded driver-side training sample as raw rows — the shared sampling
    * policy ([[KMeans.seededSample]]), exposed so multi-model trainings
    * ([[Opq]], comparison queries) collect the corpus sample ONCE.
    */
  def sampleRows(
      df: DataFrame,
      vecCol: String,
      maxSample: Int,
      seed: Long
  ): Array[Array[Double]] =
    KMeans
      .seededSample(
        df.select(col(vecCol).cast("array<double>").as("v")), maxSample, seed)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Fit PQ codebooks on already-collected rows: the single shared
    * subspace-split + seeded-[[KMeansLocal]] tail every PQ-family training
    * routes through (one copy, no drift between plain PQ and OPQ).
    */
  def fitLocal(
      rows: Array[Array[Double]],
      m: Int,
      k: Int,
      seed: Long
  ): PQModel = {
    require(rows.nonEmpty, "PQ train on empty data")
    val d = rows(0).length
    require(rows.forall(_.length == d), "inconsistent vector dims")
    require(d % m == 0, s"D=$d not divisible by M=$m")
    val dp = d / m
    val codebooks = Array.tabulate(m) { mi =>
      val sub = rows.map(v => java.util.Arrays.copyOfRange(v, mi * dp, (mi + 1) * dp))
      KMeansLocal.fit(sub, k, seed + mi).centroids
    }
    PQModel(m, k, d, codebooks)
  }

  /** Broadcast the model for executor-side evaluation (used by the
    * partition-batched kernels; the column functions below embed the flat
    * codebook in the plan instead — same wire cost, stays in codegen).
    */
  def broadcastModel(spark: SparkSession, model: PQModel): Broadcast[PQModel] =
    spark.sparkContext.broadcast(model)

  private def expr(c: Column) = GraftColumnBridge.expression(c)
  private def column(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftColumnBridge.column(e)

  /** Column: PQ code (array<short>) of an array<double> vector column.
    * Native codegen kernel ([[graft.functions.PQEncodeExpr]]) — no per-row
    * boxing; bit-equal to [[PQModel.encodeVec]] (PQExpressionsSpec).
    */
  def encodeCol(model: PQModel, vec: Column): Column =
    column(PQEncodeExpr(expr(vec), model.flatCodebook, model.m, model.k, model.dp))

  /** Column: reconstructed array<double> from an array<short> code column. */
  def decodeCol(model: PQModel, code: Column): Column =
    column(PQDecodeExpr(expr(code), model.flatCodebook, model.m, model.k, model.dp))

  /** Column: asymmetric distance between a raw vector and a code. */
  def adcCol(model: PQModel, vec: Column, code: Column): Column =
    column(PQAdcExpr(expr(vec), expr(code), model.flatCodebook, model.m, model.k, model.dp))

  /** Column: symmetric distance between two code columns. */
  def sdcCol(model: PQModel, a: Column, b: Column): Column =
    column(PQSdcExpr(expr(a), expr(b), model.flatCodebook, model.m, model.k, model.dp))

  /** Column: the per-query ADC lookup table (array<double>, length M*K) —
    * the reference's batch tactic (py/PRODUCT_QUANTIZATION.md:157-169).
    * Compute once per query row, then [[adcFromLutCol]] per candidate.
    */
  def lutCol(model: PQModel, vec: Column): Column =
    column(PQLutExpr(expr(vec), model.flatCodebook, model.m, model.k, model.dp))

  /** Column: ADC from a precomputed LUT column — M array lookups per
    * distance, bit-identical to [[adcCol]] on the same (query, code).
    */
  def adcFromLutCol(model: PQModel, lut: Column, code: Column): Column =
    column(PQAdcLutExpr(expr(lut), expr(code), model.m, model.k))

  /** Bulk encode: (id, code) via a partition-batched kernel — one model
    * reference per partition, primitive arrays end to end. Use this for
    * corpus-scale ingestion (the column form [[encodeCol]] pays per-row
    * Seq boxing); output is the PQ-coded table HNSW/IVF builds consume.
    */
  def encodePartitioned(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: PQModel
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = broadcastModel(spark, model)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, v) => (id, m.encodeVec(v)) }
      }
      .toDF(idCol, "code")
  }

  /** Codebook sink: small Parquet table (m, k, centroid) —
    * ref: py/pq.py:351-381 Get/SetCodebooks.
    */
  def saveCodebooks(spark: SparkSession, model: PQModel, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      mi <- 0 until model.m
      ki <- 0 until model.k
    } yield (mi, ki, model.codebooks(mi)(ki).toSeq)
    rows.toDF("m", "k", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Codebook source: validates the (M, K, D') shape on load
    * (ref: py/pq.py:362-376 SetCodebooks validation).
    */
  def loadCodebooks(spark: SparkSession, path: String): PQModel = {
    val rows = spark.read.parquet(path)
      .select(col("m"), col("k"), col("centroid").cast("array<double>"))
      .collect()
    require(rows.nonEmpty, "empty codebook table")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * k, s"codebook table is not dense ${m}x$k")
    val dp = rows(0).getSeq[Double](2).length
    val codebooks = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r =>
      val c = r.getSeq[Double](2).toArray
      require(c.length == dp, "ragged centroid widths")
      codebooks(r.getInt(0))(r.getInt(1)) = c
    }
    PQModel(m, k, m * dp, codebooks.map(_.toArray))
  }
}

/** The reference's compression interface (py/vector_compression.py:13-94)
  * as a Scala trait: pluggable codec between raw vectors and compact codes,
  * with build-time (symmetric) and query-time (asymmetric) distances —
  * HNSW builds over codes use sdc, searches with a raw query use adc
  * (py/hnsw.py:184-189).
  */
trait VectorCompression extends Serializable {
  def encode(v: Array[Double]): Array[Short]
  def decode(code: Array[Short]): Array[Double]
  def distance(a: Array[Short], b: Array[Short]): Double
  def queryDistance(q: Array[Double], code: Array[Short]): Double
}

/** PQ-backed compression (py/vector_compression.py:97-135). */
final class PQCompression(val model: PQModel) extends VectorCompression {
  def encode(v: Array[Double]): Array[Short] = model.encodeVec(v)
  def decode(code: Array[Short]): Array[Double] = model.decodeCode(code)
  def distance(a: Array[Short], b: Array[Short]): Double = model.sdc(a, b)
  def queryDistance(q: Array[Double], code: Array[Short]): Double =
    model.adc(q, code)
}
