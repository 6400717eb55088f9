package graft

import org.apache.spark.sql.functions._

import graft.operators.ClusterEval

/** Closed-form gates for the clustering-eval tier (ARI/NMI, per-cluster
  * census, CH/DB indexes).
  */
class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  test("ARI/NMI: perfect agreement is exactly 1/1; independence is -0.5/0") {
    val ids = (0L to 3L)
    val perfectA = ids.map(i => (i, i / 2)).toDF("id", "cluster")
    val perfectB = ids.map(i => (i, i / 2)).toDF("id", "label")
    val r1 = ClusterEval.agreement(perfectA, perfectB).head
    assert(r1.getLong(0) == 4L)
    assert(r1.getDouble(1) == 1.0, s"perfect ARI ${r1.getDouble(1)}")
    assert(math.abs(r1.getDouble(2) - 1.0) < 1e-12, s"perfect NMI ${r1.getDouble(2)}")
    // u = [0,0,1,1] vs v = [0,1,0,1]: all nij = 1 → ARI = -1/2, MI = 0
    val vB = ids.map(i => (i, i % 2)).toDF("id", "label")
    val r2 = ClusterEval.agreement(perfectA, vB).head
    assert(math.abs(r2.getDouble(1) - (-0.5)) < 1e-12, s"ARI ${r2.getDouble(1)}")
    assert(math.abs(r2.getDouble(2)) < 1e-12, s"NMI ${r2.getDouble(2)}")
  }

  test("rocAuc: closed-form separable/reversed/tied/degenerate cases") {
    // perfectly separable: every positive outranks every negative → 1.0
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("s", "pos")
    val r1 = ClusterEval.rocAuc(sep, "s", "pos").head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((2L, 2L, 4L)))
    assert(r1.getDouble(3) == 1.0)
    // reversed → 0.0
    val rev = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("s", "pos")
    assert(ClusterEval.rocAuc(rev, "s", "pos").head.getDouble(3) == 0.0)
    // all scores tied → average ranks give exactly 0.5 regardless of labels
    val tied = Seq((7.0, true), (7.0, false), (7.0, true), (7.0, false))
      .toDF("s", "pos")
    val r3 = ClusterEval.rocAuc(tied, "s", "pos").head
    assert(r3.getLong(2) == 1L && r3.getDouble(3) == 0.5)
    // hand-computed mixed case with a tie straddling the labels:
    // scores (1-,2+,2-,3+): ranks 1, (2.5,2.5), 4 → U = (2.5+4) - 3 = 3.5
    // → AUC = 3.5/4 = 0.875
    val mix = Seq((1.0, false), (2.0, true), (2.0, false), (3.0, true))
      .toDF("s", "pos")
    assert(ClusterEval.rocAuc(mix, "s", "pos").head.getDouble(3) == 0.875)
    // degenerate one-sided labels → 0.5, never NaN
    val onesided = Seq((1.0, true), (2.0, true)).toDF("s", "pos")
    assert(ClusterEval.rocAuc(onesided, "s", "pos").head.getDouble(3) == 0.5)
    // partition-invariance: the rank path must not depend on layout
    val big = (0 until 200)
      .map(i => ((i % 7).toDouble, i % 3 == 0)).toDF("s", "pos")
    val a = ClusterEval.rocAuc(big.repartition(7), "s", "pos").head.toSeq
    val b = ClusterEval.rocAuc(big.coalesce(1), "s", "pos").head.toSeq
    assert(a == b)
  }

  test("calibrationBins: perfectly calibrated fixture has zero gaps; counts conserve; clamp works") {
    // bin 2 (scores .25): 1 of 4 positive → frac .25 == mean score, gap 0
    // bin 7 (scores .75): 3 of 4 positive → gap 0
    // score 1.0 clamps into bin 9
    val rows = Seq(
      (0.25, true), (0.25, false), (0.25, false), (0.25, false),
      (0.75, true), (0.75, true), (0.75, true), (0.75, false),
      (1.0, true)
    ).toDF("score", "pos")
    val got = ClusterEval.calibrationBins(rows, "score", "pos", 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got.keySet == Set(2L, 7L, 9L))
    assert(got(2L) == ((4L, 1L, 0.25, 0.25, 0.0)))
    assert(got(7L) == ((4L, 3L, 0.75, 0.75, 0.0)))
    assert(got(9L) == ((1L, 1L, 1.0, 1.0, 0.0)))
    // miscalibrated: all scores .9 but only half positive → gap = -0.4,
    // ECE = |gap| since one bin holds everything
    val bad = Seq((0.9, true), (0.9, false)).toDF("score", "pos")
    val b = ClusterEval.calibrationBins(bad, "score", "pos", 10).head
    assert(b.getLong(0) == 9L && b.getDouble(5) == -0.4)
    val ece = math.abs(b.getDouble(5)) * b.getLong(1) / 2.0
    assert(ece == 0.4)
  }

  test("isotropy: orthonormal basis → 0; identical vectors → 1; sign-split → -1/(N-1) pattern") {
    // perfectly isotropic: the 4 standard basis vectors, all cosines 0
    val basis = (0 until 4)
      .map(i => Tuple1(Array.tabulate(4)(j => if (i == j) 1.0 else 0.0).toSeq))
      .toDF("v")
    val r0 = ClusterEval.isotropy(basis, "v").head
    assert(r0.getLong(0) == 4L && r0.getLong(1) == 4L)
    assert(r0.getDouble(2) == 0.0, s"basis mean_cos ${r0.getDouble(2)}")
    // maximally anisotropic: every vector identical → mean cosine 1
    val same = (0 until 5).map(_ => Tuple1(Seq(3.0, 4.0))).toDF("v")
    val r1 = ClusterEval.isotropy(same, "v").head
    assert(math.abs(r1.getDouble(2) - 1.0) < 1e-9)
    assert(r1.getDouble(3) == 5.0) // mean norm of (3,4)
    // antipodal pair: cosines -1 → mean over ordered pairs = -1
    val anti = Seq(Tuple1(Seq(1.0, 0.0)), Tuple1(Seq(-1.0, 0.0))).toDF("v")
    val r2 = ClusterEval.isotropy(anti, "v").head
    assert(math.abs(r2.getDouble(2) - (-1.0)) < 1e-9)
    // partition invariance of the decimal-routed centroid
    val big = (0 until 100)
      .map(i => Tuple1(Seq(math.sin(i * 0.1), math.cos(i * 0.1), 0.5)))
      .toDF("v")
    val a = ClusterEval.isotropy(big.repartition(7), "v").head.toSeq
    val b = ClusterEval.isotropy(big.coalesce(1), "v").head.toSeq
    assert(a == b)
  }

  test("NMI guard: a single-cluster assignment scores 0, not NaN") {
    val ids = (0L to 5L)
    val one = ids.map(i => (i, 0L)).toDF("id", "cluster")
    val truth = ids.map(i => (i, i % 3)).toDF("id", "label")
    val r = ClusterEval.agreement(one, truth).head
    assert(!r.getDouble(1).isNaN)
    assert(r.getDouble(2) == 0.0)
  }

  test("ARI guard: degenerate partitions hit the 0/0 convention, not NaN") {
    val ids = (0L to 5L)
    val truth3 = ids.map(i => (i, i % 3)).toDF("id", "label")
    // identical trivial partitions (one cluster both sides): ARI = 1
    val one = ids.map(i => (i, 0L)).toDF("id", "cluster")
    val oneT = ids.map(i => (i, 0L)).toDF("id", "label")
    val r1 = ClusterEval.agreement(one, oneT).head
    assert(r1.getDouble(1) == 1.0, s"one-vs-one ARI ${r1.getDouble(1)}")
    // all singletons both sides: also identical-trivial → 1
    val singles = ids.map(i => (i, i)).toDF("id", "cluster")
    val singlesT = ids.map(i => (i, i)).toDF("id", "label")
    val r2 = ClusterEval.agreement(singles, singlesT).head
    assert(r2.getDouble(1) == 1.0, s"singletons ARI ${r2.getDouble(1)}")
    // singletons vs one cluster: denominator nonzero, plain 0 — and the
    // non-degenerate path must be untouched by the guard
    val r3 = ClusterEval.agreement(singles, oneT).head
    assert(r3.getDouble(1) == 0.0, s"singletons-vs-one ARI ${r3.getDouble(1)}")
    val r4 = ClusterEval.agreement(one, truth3).head
    assert(!r4.getDouble(1).isNaN)
  }

  private def geom = {
    val pts = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(2.0, 0.0)),
      (2L, Seq(10.0, 0.0)), (3L, Seq(12.0, 0.0))).toDF("id", "v")
    val asg = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)).toDF("id", "cluster")
    val cents = Array(Array(1.0, 0.0), Array(11.0, 0.0))
    (pts, asg, cents)
  }

  test("perCluster: closed-form wss and mean distance on two 1-d blobs") {
    val (pts, asg, cents) = geom
    val rows = ClusterEval.perCluster(pts, asg, cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(rows(0L) == ((2L, 2.0, 1.0)), s"${rows(0L)}")
    assert(rows(1L) == ((2L, 2.0, 1.0)), s"${rows(1L)}")
  }

  test("indexes: CH = 50, DB = 0.2 on the hand geometry") {
    val (pts, asg, cents) = geom
    val r = ClusterEval.indexes(pts, asg, cents, dim = 2).head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 4.0, s"wss ${r.getDouble(1)}") // W = 1+1+1+1
    assert(r.getDouble(2) == 100.0, s"bss ${r.getDouble(2)}") // 2·25 + 2·25
    assert(r.getDouble(3) == 50.0, s"ch ${r.getDouble(3)}") // (100/1)/(4/2)
    assert(math.abs(r.getDouble(4) - 0.2) < 1e-12, s"db ${r.getDouble(4)}")
  }

  test("partition invariance") {
    val (pts, asg, cents) = geom
    val a = ClusterEval.indexes(pts, asg, cents, 2).head.toSeq
    val b = ClusterEval.indexes(pts.repartition(5), asg.repartition(3), cents, 2)
      .head.toSeq
    assert(a == b)
  }
}
