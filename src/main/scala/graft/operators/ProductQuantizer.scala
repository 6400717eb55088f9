package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    * cells, never a full M×K table (ref: py/pq.py:313-314).
    */
  def adc(q: Array[Double], code: Array[Short]): Double = {
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val c = codebooks(mi)(code(mi).toInt)
      val off = mi * dp
      var j = 0
      while (j < dp) { val df = q(off + j) - c(j); s += df * df; j += 1 }
      mi += 1
    }
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
  ): PQModel = {
    val rows = KMeans
      .seededSample(
        df.select(col(vecCol).cast("array<double>").as("v")), maxSample, seed)
      .collect()
      .map(_.getSeq[Double](0).toArray)
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

  /** Broadcast the model for executor-side evaluation. */
  def broadcastModel(spark: SparkSession, model: PQModel): Broadcast[PQModel] =
    spark.sparkContext.broadcast(model)

  /** Column: PQ code (array<short>) of an array<double> vector column. */
  def encodeCol(bc: Broadcast[PQModel], vec: Column): Column = {
    val f = udf { (v: Seq[Double]) => bc.value.encodeVec(v.toArray) }
    f(vec)
  }

  /** Column: reconstructed array<double> from an array<short> code column. */
  def decodeCol(bc: Broadcast[PQModel], code: Column): Column = {
    val f = udf { (c: Seq[Short]) => bc.value.decodeCode(c.toArray) }
    f(code)
  }

  /** Column: asymmetric distance between a raw vector and a code. */
  def adcCol(bc: Broadcast[PQModel], vec: Column, code: Column): Column = {
    val f = udf { (v: Seq[Double], c: Seq[Short]) =>
      bc.value.adc(v.toArray, c.toArray)
    }
    f(vec, code)
  }

  /** Column: symmetric distance between two code columns. */
  def sdcCol(bc: Broadcast[PQModel], a: Column, b: Column): Column = {
    val f = udf { (x: Seq[Short], y: Seq[Short]) =>
      bc.value.sdc(x.toArray, y.toArray)
    }
    f(a, b)
  }

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
