package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Residual (multi-stage / additive) vector quantization — the codec
  * family member between PQ and full re-ranking: M full-dimension
  * codebooks applied SEQUENTIALLY, each stage quantizing the residual the
  * previous stages left (Juang & Gray 1982 multistage VQ; Chen, Guan &
  * Wang 2010 for ANN; the codec inside modern neural audio codecs).
  * Where PQ slices dimensions (independent subspaces, no cross-dim
  * structure), RVQ refines magnitude: recon = Σ_m codebook_m[code_m],
  * so each extra stage spends k more centroids halving-ish the residual
  * energy — the right shape when coordinates are correlated.
  *
  * Reference framing: a third `VectorCompression` next to PQ
  * (/root/reference/py/pq.py) and the SQ/BQ codecs — same
  * train/encode/reconstruct surface, different geometry.
  *
  * Spark shape: encode/recon are PURE CODEGEN COLUMN CHAINS — per stage
  * one native argmin ([[graft.functions.ArgminCentroidExpr]]) and one
  * `zip_with` subtraction against the plan-embedded codebook (M·k·d
  * doubles, kilobytes at codec sizes). No shuffle, no UDF; Catalyst
  * subexpression elimination shares the stage-m residual between the
  * code and the stage-m+1 input. Expression size grows with M — at the
  * typical M ≤ 4–8 this is immaterial; a `mapPartitions` bulk kernel
  * ([[encodeLocal]] batched) is the escape hatch beyond that.
  *
  * Training is stage-wise k-means on driver-resident residuals
  * ([[trainLocal]]) — codebooks are k·d-sized model state, the same
  * sample-then-broadcast budget as PQ codebook training; RQSpec gates
  * the monotone per-stage MSE contraction that makes the codec real.
  */
object ResidualQuantizer {

  final case class RQModel(
      m: Int,
      k: Int,
      d: Int,
      codebooks: Array[Array[Array[Double]]] // (stage)(code)(dim)
  ) {
    require(m >= 1 && codebooks.length == m, s"RQModel: $m stages")
    require(
      codebooks.forall(cb => cb.length == k && cb.forall(_.length == d)),
      s"RQModel: every stage needs $k × $d centroids")
  }

  /** Stage-wise training: k-means (seeded, deterministic) on the
    * residuals of the stages before it.
    */
  def trainLocal(
      sample: Array[Array[Double]],
      m: Int,
      k: Int,
      seed: Long,
      maxIter: Int = 25
  ): RQModel = {
    require(sample.nonEmpty, "trainLocal on empty sample")
    val d = sample(0).length
    val resid = sample.map(_.clone())
    val books = Array.tabulate(m) { mi =>
      val r = KMeansLocal.fit(resid, k, seed + mi, maxIter)
      val cb = r.centroids
      var i = 0
      while (i < resid.length) {
        val c = cb(argminLocal(resid(i), cb))
        var j = 0
        while (j < d) { resid(i)(j) -= c(j); j += 1 }
        i += 1
      }
      cb
    }
    RQModel(m, k, d, books)
  }

  private def argminLocal(v: Array[Double], cb: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = KMeansLocal.l2Sq(v, cb(0))
    var c = 1
    while (c < cb.length) {
      val dc = KMeansLocal.l2Sq(v, cb(c))
      if (dc < bestD) { bestD = dc; best = c }
      c += 1
    }
    best
  }

  /** Driver/executor twin of [[encodeCol]] — identical arithmetic
    * (left-to-right Double accumulation, first-index tie-break).
    */
  def encodeLocal(model: RQModel, v: Array[Double]): Array[Int] = {
    val r = v.clone()
    Array.tabulate(model.m) { mi =>
      val c = argminLocal(r, model.codebooks(mi))
      val cw = model.codebooks(mi)(c)
      var j = 0
      while (j < model.d) { r(j) -= cw(j); j += 1 }
      c
    }
  }

  def reconLocal(model: RQModel, codes: Array[Int]): Array[Double] = {
    val out = new Array[Double](model.d)
    var mi = 0
    while (mi < model.m) {
      val cw = model.codebooks(mi)(codes(mi))
      var j = 0
      while (j < model.d) { out(j) += cw(j); j += 1 }
      mi += 1
    }
    out
  }

  /** codes as `array<int>` (length m): per stage the native codegen
    * argmin over the stage codebook, then the residual carried to the
    * next stage by a `zip_with` subtraction of the chosen codeword.
    */
  def encodeCol(spark: SparkSession, model: RQModel, v: Column): Column = {
    var r = v
    val codes = (0 until model.m).map { mi =>
      val cbLit = typedLit(model.codebooks(mi).map(_.toSeq).toSeq)
      val c = KMeans.assignCol(spark, model.codebooks(mi), r)
      r = zip_with(r, element_at(cbLit, c + 1), (a, b) => a - b)
      c
    }
    array(codes: _*)
  }

  /** recon as `array<double>`: Σ over stages of the indexed codeword —
    * `zip_with` addition chain over plan-embedded codebooks.
    */
  def reconCol(model: RQModel, codes: Column): Column =
    (0 until model.m)
      .map { mi =>
        val cbLit = typedLit(model.codebooks(mi).map(_.toSeq).toSeq)
        element_at(cbLit, element_at(codes, mi + 1) + 1)
      }
      .reduceLeft((a, b) => zip_with(a, b, (x, y) => x + y))

  /** Per-query dot LUT for one stage: ⟨q, codeword⟩ for every codeword —
    * a k-element array column computed ONCE on the (small) query side
    * before the pair join, so the per-pair ADC cost is lookups + adds,
    * never a dot product (the Jégou ADC move, additive-codes edition).
    */
  def dotLutCol(model: RQModel, stage: Int, qv: Column): Column = {
    import graft.functions.VectorExpressions.dotFast
    transform(
      typedLit(model.codebooks(stage).map(_.toSeq).toSeq),
      c => dotFast(qv, c))
  }

  /** Query-independent half of the 2-stage ADC estimate:
    * nrm(c0,c1) = ‖w0‖² + ‖w1‖² + 2⟨w0,w1⟩ = ‖w0 + w1‖², as a k×k
    * table (k² doubles — kilobytes, plan-embeddable), so
    * dist(q, recon) = ((⟨q,q⟩ − 2·d0[c0]) − 2·d1[c1]) + nrm[c0][c1]
    * with d_m the [[dotLutCol]] arrays. Accumulation is left-to-right
    * per term, and the combination order above is part of the contract
    * (the oracle mirrors it exactly).
    */
  def pairNormTable(model: RQModel): Array[Array[Double]] = {
    require(model.m == 2, "pairNormTable: 2-stage serving shape")
    val b0 = model.codebooks(0)
    val b1 = model.codebooks(1)
    def sq(c: Array[Double]): Double = {
      var s = 0.0
      var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      s
    }
    val n0 = b0.map(sq)
    val n1 = b1.map(sq)
    Array.tabulate(model.k, model.k) { (k0, k1) =>
      var cx = 0.0
      var j = 0
      while (j < model.d) { cx += b0(k0)(j) * b1(k1)(j); j += 1 }
      (n0(k0) + n1(k1)) + 2 * cx
    }
  }
}
