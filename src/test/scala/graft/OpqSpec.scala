package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators._

/** OPQ (Ge et al. 2013, parametric variant): eigensolver sanity, rotation
  * isometry, the headline reconstruction-error win over plain PQ on
  * anisotropic correlated data, and column-kernel == driver-kernel
  * equality.
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded orthonormal matrix via Gram-Schmidt on a random Gaussian. */
  private def randomRotation(d: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Random(seed)
    val g = Array.fill(d, d)(rng.nextGaussian())
    for (i <- 0 until d) {
      for (j <- 0 until i) {
        val dot = (0 until d).map(x => g(i)(x) * g(j)(x)).sum
        for (x <- 0 until d) g(i)(x) -= dot * g(j)(x)
      }
      val nrm = math.sqrt((0 until d).map(x => g(i)(x) * g(i)(x)).sum)
      for (x <- 0 until d) g(i)(x) /= nrm
    }
    g
  }

  /** Anisotropic correlated cloud: x = U · (decaying scales ⊙ z). Plain
    * PQ's contiguous raw-dim slices cut across U's mixing; OPQ's PCA
    * basis undoes it.
    */
  private def anisotropic(
      n: Int,
      d: Int,
      seed: Long,
      decay: Double = 4.0
  ): Seq[Array[Double]] = {
    val u = randomRotation(d, seed)
    val rng = new Random(seed + 1)
    val scales = Array.tabulate(d)(i => math.pow(2.0, -i / decay))
    (0 until n).map { _ =>
      val z = Array.tabulate(d)(i => rng.nextGaussian() * scales(i))
      Array.tabulate(d)(i => (0 until d).map(j => u(j)(i) * z(j)).sum)
    }
  }

  test("jacobiEigen: recovers eigenpairs of a symmetric matrix") {
    // A = [[2,1],[1,2]] -> eigenvalues {1, 3}
    val (vals, vecs) = Opq.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // A·v = λ·v for each pair
    for (i <- 0 until 2) {
      val v = vecs(i)
      val av = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      assert(math.abs(av(0) - vals(i) * v(0)) < 1e-9)
      assert(math.abs(av(1) - vals(i) * v(1)) < 1e-9)
    }
  }

  test("balancedAllocation: products of eigenvalues balanced across subspaces") {
    val eig = Array(256.0, 64.0, 16.0, 4.0, 1.0, 1.0, 1.0, 1.0)
    val perm = Opq.balancedAllocation(eig, m = 2)
    assert(perm.sorted.toSeq == (0 until 8).toSeq) // a permutation
    val s0 = perm.take(4).map(i => math.log(eig(i))).sum
    val s1 = perm.drop(4).map(i => math.log(eig(i))).sum
    // greedy keeps the log-sums within one largest-log of each other
    assert(math.abs(s0 - s1) <= math.log(256.0) + 1e-9)
    // sub-unit eigenvalues — the NORMAL regime for unit-scale embeddings.
    // A raw-log min-sum greedy collapses here (negative weights make the
    // bucket holding the largest item look smallest, so it absorbs
    // everything: contiguous split, log-sums -1.20 vs -4.42); the shifted
    // greedy must stay balanced (~-2.92 vs -2.70).
    val eigSmall = Array(0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2)
    val permS = Opq.balancedAllocation(eigSmall, m = 2)
    assert(permS.sorted.toSeq == (0 until 8).toSeq)
    val a0 = permS.take(4).map(i => math.log(eigSmall(i))).sum
    val a1 = permS.drop(4).map(i => math.log(eigSmall(i))).sum
    assert(math.abs(a0 - a1) < 0.7, s"sub-unit eigenvalues unbalanced: $a0 vs $a1")
  }

  test("trained rotation is orthonormal and isometric") {
    val data = anisotropic(500, 8, seed = 7)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val model = Opq.train(df, "v", m = 2, k = 8, seed = 11)
    val r = model.rotation
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(x => r(i)(x) * r(j)(x)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8,
        s"RRᵀ[$i][$j] = $dot")
    }
    val a = data(0); val b = data(1)
    val ra = model.rotate(a); val rb = model.rotate(b)
    def l2(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    assert(math.abs(l2(a, b) - l2(ra, rb)) < 1e-9)
    // unrotate inverts rotate
    val back = model.unrotate(ra)
    assert(a.zip(back).forall { case (p, q) => math.abs(p - q) < 1e-9 })
  }

  test("OPQ reconstruction MSE beats plain PQ on anisotropic correlated data") {
    val data = anisotropic(2000, 16, seed = 3)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val pq = ProductQuantizer.train(df, "v", m = 4, k = 16, seed = 5)
    val opq = Opq.train(df, "v", m = 4, k = 16, seed = 5)
    def mse(recon: Array[Double] => Array[Double]): Double =
      data.map { v =>
        val r = recon(v)
        v.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / data.size
    val pqMse = mse(v => pq.decodeCode(pq.encodeVec(v)))
    val opqMse = mse(v => opq.reconstruct(opq.encodeVec(v)))
    assert(opqMse < 0.9 * pqMse,
      s"OPQ MSE $opqMse not < 0.9 × plain PQ MSE $pqMse")
  }

  test("OPQ composes with IVFADC (FAISS OPQ,IVF,PQ): isometric cells, sound recall") {
    // The composition contract, gated on its INVARIANTS rather than a
    // blanket "OPQ wins" claim: the rotation commutes with the coarse
    // quantizer (k-means is isometry-equivariant), so cell assignments
    // and probe sets must be IDENTICAL between the raw and rotated arms —
    // only the residual codes differ. Recall is floor-gated and band-
    // compared: on unimodal raw distributions OPQ's allocation wins (the
    // MSE test above); on coarse-quantizer residuals at 4-bit
    // subquantizers it is data-dependent (FAISS's own OPQ guidance), so
    // asserting strict superiority here would be a false universal.
    val d = 16
    val data = anisotropic(3000, d, seed = 13)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "vec")
    val cents = KMeansLocal.fit(data.toArray, 8, seed = 17).centroids
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int =
      cs.indices.minBy(i => v.zip(cs(i)).map { case (a, b) => (a - b) * (a - b) }.sum)
    def residuals(rows: Seq[Array[Double]], cs: Array[Array[Double]]) =
      rows.map { v =>
        val c = cs(nearest(v, cs))
        v.zip(c).map { case (a, b) => a - b }
      }
    def trainPq(rows: Seq[Array[Double]], m: Int, k: Int, seed: Long): PQModel = {
      val dp = d / m
      PQModel(m, k, d, Array.tabulate(m) { mi =>
        val sub = rows.map(v => java.util.Arrays.copyOfRange(v, mi * dp, (mi + 1) * dp))
        KMeansLocal.fit(sub.toArray, k, seed + mi).centroids
      })
    }
    // the rotation must be learned on the RESIDUAL distribution (what PQ
    // actually encodes under IVFADC), not the raw one — FAISS's OPQ
    // pre-transform sits between the coarse quantizer and the PQ
    val rawResid = residuals(data, cents)
    val residDf = rawResid.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "vec")
    val opq = Opq.train(residDf, "vec", m = 4, k = 16, seed = 19)
    val centsR = cents.map(opq.rotate)
    val pqRaw = trainPq(rawResid, 4, 16, seed = 19)
    val pqRot = trainPq(rawResid.map(opq.rotate), 4, 16, seed = 19)
    val dfRot = df.select(col("vec_id"), Opq.rotateCol(opq, col("vec")).as("vec"))
    val q = df.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val qRot = dfRot.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val exact = BruteForceKNN.knn(
      q, df.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 10
    ).select(col("query_id"), col("neighbor_id"))
    val denom = exact.count().toDouble
    def recallOf(
        idx: org.apache.spark.sql.DataFrame,
        qq: org.apache.spark.sql.DataFrame,
        cs: Array[Array[Double]],
        pm: PQModel
    ): Double =
      IvfAdc.search(spark, idx, qq, "query_id", "qv", cs, pm, k = 10, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count() / denom
    val rawIdx = IvfAdc.encode(spark, df, "vec_id", "vec", cents, pqRaw)
    val rotIdx = IvfAdc.encode(spark, dfRot, "vec_id", "vec", centsR, pqRot)
    // isometry invariant: identical cell assignment for every vector
    val cellsDiffer = rawIdx.select(col("id"), col("cell"))
      .except(rotIdx.select(col("id"), col("cell"))).count()
    assert(cellsDiffer == 0, s"$cellsDiffer vectors change cells under rotation")
    val rRaw = recallOf(rawIdx, q, cents, pqRaw)
    val rRot = recallOf(rotIdx, qRot, centsR, pqRot)
    info(s"IVFADC recall@10 nprobe=3: raw=$rRaw opq=$rRot")
    assert(rRot >= 0.35, s"OPQ-IVFADC recall too low: $rRot")
    assert(rRot >= rRaw - 0.1,
      s"OPQ-IVFADC recall $rRot more than 0.1 below plain $rRaw")
  }

  test("column kernels == driver kernels (encode bit-equal, recon ≈, adc isometry)") {
    val data = anisotropic(200, 8, seed = 23)
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val model = Opq.train(df, "v", m = 2, k = 8, seed = 31)
    val got = df
      .select(col("id"), Opq.encodeCol(model, col("v")).as("code"))
      .orderBy("id")
      .as[(Long, Array[Short])]
      .collect()
    val want = data.zipWithIndex.map { case (v, i) => (i.toLong, model.encodeVec(v)) }
    got.zip(want).foreach { case ((gi, gc), (wi, wc)) =>
      assert(gi == wi && gc.sameElements(wc), s"encode mismatch at id $gi")
    }
    // bulk kernel agrees too
    val bulk = Opq.encodePartitioned(df, "id", "v", model)
      .orderBy("id").as[(Long, Array[Short])].collect()
    bulk.zip(want).foreach { case ((gi, gc), (_, wc)) =>
      assert(gc.sameElements(wc), s"bulk encode mismatch at id $gi")
    }
    val recon = df
      .select(col("id"), Opq.reconstructCol(model, Opq.encodeCol(model, col("v"))).as("r"))
      .orderBy("id")
      .as[(Long, Array[Double])]
      .collect()
    recon.zip(want).foreach { case ((gi, gr), (_, wc)) =>
      val wr = model.reconstruct(wc)
      assert(gr.zip(wr).forall { case (a, b) => math.abs(a - b) < 1e-9 },
        s"recon mismatch at id $gi")
    }
    // ADC isometry: adc(R·q, code) == ||q - reconstruct(code)||² (fp slack)
    val q = data(7)
    val code = model.encodeVec(data(11))
    val viaAdc = model.queryDistance(q, code)
    val viaRecon = {
      val r = model.reconstruct(code)
      q.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    assert(math.abs(viaAdc - viaRecon) < 1e-9)
  }
}
