package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions

/** Corpus-scale principal component analysis of an embedding column —
  * the standard preprocessing step in front of embedding dedup
  * (SemDeDup-style pipelines whiten before cosine thresholds) and
  * compressed retrieval (PCA rotation before quantization; the reference's
  * OPQ path learns the same basis from a driver-side sample,
  * /root/reference/py/vector_compression.py via [[Opq]]).
  *
  * Unlike [[Opq.train]]'s seeded-sample + Jacobi eigensolve (whose
  * iteration count is data-dependent, hence `pq_opq_recon` is rows-only),
  * this operator is hash-checkable end to end:
  *
  *  - '''Moments''' are computed over the WHOLE corpus with
  *    DECIMAL(38,30)-exact sums — order-free, so Spark's parallel
  *    aggregation and DuckDB's serial scan agree bit-for-bit. The upper
  *    triangle of E[x xᵀ] is d(d+1)/2 cells; Spark's hash aggregate does
  *    map-side partial aggregation, so the shuffle carries only
  *    `numPartitions × d(d+1)/2` partial rows regardless of corpus size —
  *    the O(N·d²) multiply work is embarrassingly parallel in the scan
  *    stage. At 100 TB this is a single pass with a tiny shuffle.
  *  - '''Eigenvectors''' come from a FIXED number of power-iteration
  *    rounds with a deterministic one-hot init (argmax diagonal variance,
  *    ties to the lowest index) and greedy deflation — O(R·d²) driver
  *    arithmetic on the collected d×d matrix (d=64 → 32 KiB; bounded,
  *    like the centroid collects). Every float the iteration touches is
  *    an ascending-index left fold over doubles, which replays exactly as
  *    DuckDB `list_sum(list_transform(...))` (the same portability
  *    contract as [[VectorFunctions.l2Sq]]).
  *  - '''Projection/whitening''' is a per-row map kernel against the
  *    broadcast components: zero shuffle, linear scan — a 100 TB corpus
  *    projects in one pass.
  */
object Pca {

  /** First and second raw moments of `vecCol` (array<double>, dim d),
    * decimal-exact. Returns (n, mean, exx) where exx is the full symmetric
    * E[x xᵀ] matrix (computed on the upper triangle, mirrored).
    */
  def moments(df: DataFrame, vecCol: String, d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val dec = DecimalType(38, 30)
    val v = df.select(col(vecCol).as("v"))

    val meanRows = v
      .select(posexplode(col("v")).as(Seq("i", "xi")))
      .groupBy("i")
      .agg(sum(col("xi").cast(dec)).as("sx"), count(lit(1)).as("n"))
      .collect()
    require(meanRows.length == d, s"expected $d dims, got ${meanRows.length}")
    val n = meanRows.head.getLong(2)
    val mean = new Array[Double](d)
    meanRows.foreach { r =>
      mean(r.getInt(0)) = (r.getDecimal(1).doubleValue()) / n
    }

    // Second moments through the one-pass constant-state kernel
    // ([[graft.functions.CovMomentsAgg]]): per-partition state is
    // d(d+1)/2 exact DECIMAL(18,14)-unit sums (~16 KiB), the shuffle
    // carries one buffer per partition — never N·d(d+1)/2 exploded pair
    // rows — and the result is bit-identical to the explode + decimal-sum
    // spelling the DuckDB oracle replays.
    val cellsRow = v
      .agg(graft.functions.CovMomentsAgg.covMoments(col("v"), d).as("m"))
      .head()
    val cells = cellsRow.getSeq[java.math.BigDecimal](0)
    val exx = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val e = cells(idx).doubleValue() / n
        exx(i)(j) = e
        exx(j)(i) = e
        idx += 1
        j += 1
      }
      i += 1
    }
    (n, mean, exx)
  }

  /** cov = E[x xᵀ] − μ μᵀ, elementwise doubles. */
  def covariance(mean: Array[Double], exx: Array[Array[Double]]): Array[Array[Double]] = {
    val d = mean.length
    Array.tabulate(d, d)((i, j) => exx(i)(j) - mean(i) * mean(j))
  }

  private def matvec(c: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = v.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += c(i)(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  private def normSq(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }

  /** One principal component of symmetric `c` by `rounds` power-iteration
    * steps from a one-hot init at the argmax diagonal entry (ties to the
    * lowest index). Returns (unit eigenvector, Rayleigh quotient λ).
    * The result is DEFINED as the R-round iterate (not a convergence
    * limit), so it is deterministic and engine-replayable.
    */
  def powerComponent(c: Array[Array[Double]], rounds: Int): (Array[Double], Double) = {
    val d = c.length
    var i0 = 0
    var best = c(0)(0)
    var i = 1
    while (i < d) {
      if (c(i)(i) > best) { best = c(i)(i); i0 = i }
      i += 1
    }
    var v = Array.tabulate(d)(k => if (k == i0) 1.0 else 0.0)
    var r = 0
    while (r < rounds) {
      val w = matvec(c, v)
      val nrm = math.sqrt(normSq(w))
      // A zero matrix (constant vectors) or a deflated residual of rank
      // < p maps the iterate to 0 — keep the current unit iterate rather
      // than dividing by 0 and poisoning everything downstream with NaN.
      if (nrm == 0.0) r = rounds
      else { v = w.map(_ / nrm); r += 1 }
    }
    val cv = matvec(c, v)
    var lam = 0.0
    i = 0
    while (i < d) { lam += v(i) * cv(i); i += 1 }
    (v, lam)
  }

  /** c − λ v vᵀ — greedy deflation after extracting (v, λ). */
  def deflate(c: Array[Array[Double]], v: Array[Double], lam: Double): Array[Array[Double]] =
    Array.tabulate(c.length, c.length)((i, j) => c(i)(j) - lam * v(i) * v(j))

  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]], // (p, d), unit rows
      lambdas: Array[Double]
  )

  /** Fit the top-`p` components with `rounds` power-iteration steps each. */
  def fit(df: DataFrame, vecCol: String, d: Int, p: Int, rounds: Int): PcaModel = {
    val (_, mean, exx) = moments(df, vecCol, d)
    var c = covariance(mean, exx)
    val comps = new Array[Array[Double]](p)
    val lams = new Array[Double](p)
    var k = 0
    while (k < p) {
      val (v, lam) = powerComponent(c, rounds)
      comps(k) = v
      lams(k) = lam
      if (k + 1 < p) c = deflate(c, v, lam)
      k += 1
    }
    PcaModel(mean, comps, lams)
  }

  /** Per-row projection score onto component `k`: leftfold_i
    * (x_i − μ_i)·v_i — zero-shuffle map against the broadcast model.
    */
  def projectCol(model: PcaModel, vec: Column, k: Int): Column = {
    val mu = typedLit(model.mean.toSeq)
    val vk = typedLit(model.components(k).toSeq)
    graft.functions.VectorExpressions
      .dotFast(zip_with(vec, mu, (x, m) => x - m), vk)
  }

  /** Whitened score: projection / sqrt(λ_k). */
  def whitenCol(model: PcaModel, vec: Column, k: Int): Column =
    projectCol(model, vec, k) / math.sqrt(model.lambdas(k))

  /** PCA-residual anomaly score: ‖x − μ‖² − Σ_k score_k² — the squared
    * reconstruction error off the top-p subspace (for orthonormal
    * components), the standard embedding-space outlier signal: points
    * the principal subspace cannot explain (corrupt embeddings,
    * off-manifold content) score high. Map-only against the broadcast
    * model, left-assoc subtraction chain (replays exactly in SQL).
    */
  def residualCol(model: PcaModel, vec: Column): Column = {
    val l2 = graft.functions.VectorExpressions
      .l2SqFast(vec, typedLit(model.mean.toSeq))
    model.components.indices.foldLeft(l2) { (acc, k) =>
      val p = projectCol(model, vec, k)
      acc - p * p
    }
  }
}
