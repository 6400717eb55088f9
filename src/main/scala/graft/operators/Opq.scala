package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization, parametric variant (Ge et al., CVPR
  * 2013, "Optimized Product Quantization for Approximate Nearest Neighbor
  * Search" §4): learn an orthonormal rotation R from the data's PCA basis,
  * allocate principal directions to the M subspaces so the PRODUCT of
  * eigenvalues per subspace is balanced (equalizing each subquantizer's
  * information load), then train plain PQ on R·v. Because R is orthonormal,
  * L2 distances and reconstruction errors in the rotated space equal those
  * in the original space — OPQ changes only HOW the D dims are cut into
  * subspaces, which is exactly what plain PQ gets wrong on correlated /
  * anisotropically-scaled data (the reference's PQ cuts raw contiguous
  * slices, py/pq.py:63-78; OPQ is the published fix for that blind spot).
  *
  * Spark shape: training is a seeded driver-side sample (same policy as
  * [[ProductQuantizer.train]]) — covariance + Jacobi eigensolve of a D×D
  * matrix is O(D³) driver work, D=64 here. The rotation ships to executors
  * inside the broadcast model; encode/reconstruct are per-row map kernels
  * with zero shuffle, so a 100 TB encode remains a single scan. All
  * driver-side math is deterministic (fixed Jacobi sweep order, sign-
  * normalized eigenvectors, stable sorts), so the model is reproducible.
  */
final case class OpqModel(
    rotation: Array[Array[Double]], // (D, D): row i = output dim i
    pq: PQModel
) {
  val d: Int = rotation.length

  /** R·v. */
  def rotate(v: Array[Double]): Array[Double] = Opq.matvec(rotation, v)

  /** Rᵀ·u — the inverse rotation (R orthonormal). */
  def unrotate(u: Array[Double]): Array[Double] = {
    val out = new Array[Double](d)
    var j = 0
    while (j < d) {
      var s = 0.0
      var i = 0
      while (i < d) { s += rotation(i)(j) * u(i); i += 1 }
      out(j) = s
      j += 1
    }
    out
  }

  def encodeVec(v: Array[Double]): Array[Short] = pq.encodeVec(rotate(v))

  /** Reconstruction back in the ORIGINAL space: Rᵀ·decode(code). */
  def reconstruct(code: Array[Short]): Array[Double] =
    unrotate(pq.decodeCode(code))

  /** ADC in rotated space == ADC in original space (isometry). */
  def queryDistance(q: Array[Double], code: Array[Short]): Double =
    pq.adc(rotate(q), code)
}

object Opq {

  /** Deterministic cyclic Jacobi eigensolver for a symmetric matrix.
    * Returns (eigenvalues, eigenvectors as rows), unsorted. Fixed sweep
    * order (p < q ascending) and a fixed sweep count bound make the result
    * reproducible bit-for-bit for a given input.
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]
  ): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (sweep < 64 && off > 1e-12) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case x if x == 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(p)(i); val viq = v(q)(i)
              v(p)(i) = c * vip - s * viq
              v(q)(i) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  /** Eigenvalue-balanced allocation (Ge et al. §4.2, "eigenvalue
    * allocation"): dims sorted by eigenvalue descending, each assigned
    * greedily to the non-full subspace with the smallest Σ log λ — the
    * subspace variance PRODUCTS end up balanced, so each subquantizer
    * carries comparable information. Returns the permutation: position p
    * in the rotated vector ← sorted-eigen index perm(p).
    */
  private[graft] def balancedAllocation(
      eigvals: Array[Double],
      m: Int
  ): Array[Int] = {
    val d = eigvals.length
    val dp = d / m
    val order = eigvals.zipWithIndex.sortBy { case (l, i) => (-l, i) }
    // Shift log-weights to be non-negative before the greedy: with raw
    // logs, any eigenvalue < 1 contributes a NEGATIVE weight, so the
    // bucket that takes the largest item immediately looks "smallest"
    // and the min-sum greedy refills it — collapsing to the sorted-
    // contiguous (maximally unbalanced) split whenever all λ < 1, which
    // is the normal regime for unit-scale embeddings. Final fills are
    // equal (dp each), so the shift cancels in the end-state comparison;
    // during the walk it restores the classic non-negative LPT greedy.
    val logs = order.map { case (l, _) => math.log(math.max(l, 1e-12)) }
    val shift = -logs.min
    val sums = new Array[Double](m)
    val fill = new Array[Int](m)
    val buckets = Array.fill(m)(new scala.collection.mutable.ArrayBuffer[Int])
    for (((_, idx), w) <- order.zip(logs)) {
      var best = -1
      var bestSum = Double.MaxValue
      var b = 0
      while (b < m) {
        if (fill(b) < dp && sums(b) < bestSum) { best = b; bestSum = sums(b) }
        b += 1
      }
      buckets(best) += idx
      fill(best) += 1
      sums(best) += w + shift
    }
    buckets.flatMap(_.toSeq).toArray
  }

  /** Train OPQ: seeded sample → covariance → PCA rotation → balanced
    * dim allocation → plain PQ on the rotated sample. Same sampling policy
    * and per-subspace seeding as [[ProductQuantizer.train]], so the plain-PQ
    * comparison isolates the rotation's effect.
    */
  def train(
      df: DataFrame,
      vecCol: String,
      m: Int,
      k: Int,
      seed: Long,
      maxSample: Int = 100000
  ): OpqModel =
    trainRows(ProductQuantizer.sampleRows(df, vecCol, maxSample, seed), m, k, seed)

  /** Row-major matrix · vector (shared by [[OpqModel.rotate]] and
    * training — one kernel, no drift).
    */
  private[operators] def matvec(
      mat: Array[Array[Double]],
      v: Array[Double]
  ): Array[Double] = {
    val d = mat.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val r = mat(i)
      var s = 0.0
      var j = 0
      while (j < v.length) { s += r(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** Train on already-collected rows (see [[ProductQuantizer.sampleRows]]
    * — lets comparison paths collect the sample once for both models).
    */
  def trainRows(
      rows: Array[Array[Double]],
      m: Int,
      k: Int,
      seed: Long
  ): OpqModel = {
    require(rows.nonEmpty, "OPQ train on empty data")
    val d = rows(0).length
    require(rows.forall(_.length == d), "inconsistent vector dims")
    require(d % m == 0, s"D=$d not divisible by M=$m")
    val n = rows.length
    val mean = new Array[Double](d)
    rows.foreach { v =>
      var j = 0; while (j < d) { mean(j) += v(j); j += 1 }
    }
    var j = 0; while (j < d) { mean(j) /= n; j += 1 }
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { v =>
      var i = 0
      while (i < d) {
        val di = v(i) - mean(i)
        var jj = i
        while (jj < d) { cov(i)(jj) += di * (v(jj) - mean(jj)); jj += 1 }
        i += 1
      }
    }
    var i = 0
    while (i < d) {
      var jj = i
      while (jj < d) {
        cov(i)(jj) /= n
        cov(jj)(i) = cov(i)(jj)
        jj += 1
      }
      i += 1
    }
    val (eigvals, eigvecs) = jacobiEigen(cov)
    // sign-normalize each eigenvector (first |x| > eps component positive)
    // so the rotation is unique, not up-to-sign
    val signed = eigvecs.map { r =>
      val kNz = r.indexWhere(x => math.abs(x) > 1e-9)
      if (kNz >= 0 && r(kNz) < 0) r.map(-_) else r
    }
    val perm = balancedAllocation(eigvals, m)
    val rotation = perm.map(signed)
    val rotated = rows.map(matvec(rotation, _))
    OpqModel(rotation, ProductQuantizer.fitLocal(rotated, m, k, seed))
  }

  /** Column: R·v via the plan-embedded rotation literal — stays inside
    * whole-stage codegen (nested HOF over a 2-D literal, same tactic as
    * the MaxSim HOF form). For bulk encodes prefer [[encodePartitioned]].
    */
  def rotateCol(model: OpqModel, vec: Column): Column = {
    val rlit = typedLit(model.rotation.map(_.toSeq).toSeq)
    transform(
      rlit,
      row =>
        aggregate(
          zip_with(row, vec, (a, b) => a * b),
          lit(0.0),
          (acc, x) => acc + x
        )
    )
  }

  /** Column: OPQ code of a raw vector — rotate, then the native PQ encode
    * kernel ([[graft.functions.PQEncodeExpr]]).
    */
  def encodeCol(model: OpqModel, vec: Column): Column =
    ProductQuantizer.encodeCol(model.pq, rotateCol(model, vec))

  /** Column: reconstruction in the ORIGINAL space — native PQ decode, then
    * Rᵀ via the transposed literal.
    */
  def reconstructCol(model: OpqModel, code: Column): Column = {
    val rtLit = typedLit(model.rotation.transpose.map(_.toSeq).toSeq)
    val dec = ProductQuantizer.decodeCol(model.pq, code)
    transform(
      rtLit,
      row =>
        aggregate(
          zip_with(row, dec, (a, b) => a * b),
          lit(0.0),
          (acc, x) => acc + x
        )
    )
  }

  /** Bulk encode: one pass, broadcast model, zero shuffle — the 100 TB
    * path (mirrors [[ProductQuantizer.encodePartitioned]]).
    */
  def encodePartitioned(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: OpqModel
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val mm = bc.value
        it.map { case (id, v) => (id, mm.encodeVec(v)) }
      }
      .toDF(idCol, "code")
  }
}
