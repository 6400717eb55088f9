package graft

import org.apache.spark.sql.functions._

import graft.operators.{Opq, Pca}
import graft.queries.Q

/** Invariants for the corpus-scale power-iteration PCA. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb =
    Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Planted anisotropic corpus: strong eigengap (3.0 / 1.5 / 0.1·noise
    * along fixed axes) so fixed-round power iteration converges tightly —
    * the real sf embeddings are near-isotropic (λ2/λ1 ≈ 0.93), where the
    * "top eigenvector" is ill-conditioned by definition and only the
    * Rayleigh-quotient gate below is meaningful.
    */
  private def planted = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map { id =>
      val v = Array.tabulate(64)(_ => rnd.nextGaussian() * 0.1)
      v(3) += rnd.nextGaussian() * 3.0
      v(17) += rnd.nextGaussian() * 1.5
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "v")
  }

  test("fit: unit-norm, orthogonal, ordered components on planted spectrum") {
    val m = Pca.fit(planted, "v", d = 64, p = 2, rounds = 12)
    val n1 = math.sqrt(m.components(0).map(x => x * x).sum)
    val n2 = math.sqrt(m.components(1).map(x => x * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-9)
    assert(math.abs(n2 - 1.0) < 1e-9)
    val dot = m.components(0).zip(m.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"components not orthogonal: dot=$dot")
    assert(m.lambdas(0) >= m.lambdas(1), "eigenvalues out of order")
    assert(m.lambdas(1) > 0.0)
    // the planted axes are recovered
    assert(math.abs(m.components(0)(3)) > 0.99, "pc1 != planted axis 3")
    assert(math.abs(m.components(1)(17)) > 0.99, "pc2 != planted axis 17")
  }

  test("fit: matches the Jacobi eigensolver on planted spectrum") {
    val (_, mean, exx) = Pca.moments(planted, "v", 64)
    val c = Pca.covariance(mean, exx)
    val (evals, evecs) = Opq.jacobiEigen(c)
    val top = evals.indices.maxBy(evals(_))
    val m = Pca.fit(planted, "v", d = 64, p = 1, rounds = 12)
    val cos = m.components(0).zip(evecs(top)).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.9999, s"|cos(power, jacobi)| = ${math.abs(cos)}")
    assert(math.abs(m.lambdas(0) - evals(top)) < 1e-6 * math.abs(evals(top)))
  }

  test("fit: Rayleigh quotient near the true top eigenvalue on real data") {
    val (_, mean, exx) = Pca.moments(emb, "v", 64)
    val c = Pca.covariance(mean, exx)
    val (evals, _) = Opq.jacobiEigen(c)
    val lam1 = evals.max
    val m = Pca.fit(emb, "v", d = 64, p = 1, rounds = 48)
    assert(m.lambdas(0) <= lam1 + 1e-12, "Rayleigh quotient above top eigenvalue")
    assert(m.lambdas(0) >= 0.95 * lam1,
      s"power Rayleigh ${m.lambdas(0)} too far below jacobi top $lam1")
  }

  test("projection: score variance equals lambda; whitening normalizes it") {
    val m = Pca.fit(emb, "v", d = 64, p = 2, rounds = 30)
    val scored = emb.select(
      Pca.projectCol(m, col("v"), 0).as("p1"),
      Pca.whitenCol(m, col("v"), 0).as("w1"))
    val r = scored.agg(
      (sum(col("p1") * col("p1")) / count(lit(1))).as("vp"),
      (sum(col("w1") * col("w1")) / count(lit(1))).as("vw"),
      (sum(col("p1")) / count(lit(1))).as("mp")).head()
    assert(math.abs(r.getDouble(2)) < 1e-9, "projection not mean-centered")
    assert(math.abs(r.getDouble(0) - m.lambdas(0)) < 1e-6 * m.lambdas(0),
      s"var(pc1)=${r.getDouble(0)} != lambda1=${m.lambdas(0)}")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6, "whitened variance != 1")
  }

  test("residual: non-negative, zero on in-subspace points, explains variance") {
    val m = Pca.fit(planted, "v", d = 64, p = 2, rounds = 12)
    val r = planted.select(
      Pca.residualCol(m, col("v")).as("res"),
      graft.functions.VectorExpressions
        .l2SqFast(col("v"), typedLit(m.mean.toSeq)).as("tot"))
      .agg(sum(col("res")), sum(col("tot")), min(col("res"))).head()
    val (sres, stot, mn) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(mn > -1e-9, s"negative residual: $mn")
    // planted: variance 9 + 2.25 on two axes vs 0.01 noise per other dim
    // -> top-2 subspace explains the bulk; residual is the noise floor
    val ratio = sres / stot
    assert(ratio > 0.0 && ratio < 0.15,
      s"residual ratio $ratio outside the planted noise band")
  }

  test("covMoments: large per-row products spill exactly, no long wrap") {
    // |x_i*x_j| = 8100 → 8.1e17 unscaled 1e-14 units per row: a blind
    // Array[Long] accumulator wraps after ~11 rows. 100 identical rows in
    // ONE partition must still sum exactly (per-cell overflow spill).
    val rows = (0L until 100L).map(i => (i, Seq(90.0, 90.0)))
      .toDF("vec_id", "v").repartition(1)
    val out = rows
      .agg(graft.functions.CovMomentsAgg.covMoments(col("v"), 2).as("m"))
      .head.getSeq[java.math.BigDecimal](0)
    val expect = new java.math.BigDecimal(8100L * 100L).setScale(14)
    assert(out.size == 3)
    out.foreach(c => assert(c.compareTo(expect) == 0, s"got $c want $expect"))
  }

  test("degenerate inputs: zero covariance / rank-deficient residuals stay finite") {
    // constant vectors → zero covariance matrix: components must stay
    // finite unit one-hots (the pre-division iterate), lambdas 0
    val const = (0L until 50L).map(i => (i, Seq.fill(8)(2.5))).toDF("vec_id", "v")
    val m = Pca.fit(const, "v", d = 8, p = 3, rounds = 16)
    m.components.foreach { c =>
      assert(c.forall(x => !x.isNaN && !x.isInfinite))
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-12)
    }
    assert(m.lambdas.forall(l => math.abs(l) < 1e-9))
    // rank-1 data, p=3: deflation past the rank must not go NaN either
    val rnd = new scala.util.Random(11)
    val rank1 = (0L until 80L).map { i =>
      val t = rnd.nextGaussian()
      (i, Seq.tabulate(8)(j => if (j == 2) 3.0 * t else 0.0))
    }.toDF("vec_id", "v")
    val m1 = Pca.fit(rank1, "v", d = 8, p = 3, rounds = 16)
    m1.components.foreach(c => assert(c.forall(x => !x.isNaN && !x.isInfinite)))
    assert(m1.lambdas.forall(l => !l.isNaN))
  }

  test("fit is deterministic across runs and partitionings") {
    val a = Pca.fit(emb, "v", d = 64, p = 2, rounds = 6)
    val b = Pca.fit(emb.repartition(7), "v", d = 64, p = 2, rounds = 6)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.lambdas.toSeq == b.lambdas.toSeq)
  }

  test("projection plan is shuffle-free (broadcast model, map-only)") {
    val m = Pca.fit(emb, "v", d = 64, p = 1, rounds = 3)
    val plan = emb.select(Pca.projectCol(m, col("v"), 0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
  }
}
