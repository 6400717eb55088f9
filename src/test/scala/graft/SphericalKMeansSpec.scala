package graft

import org.apache.spark.sql.functions._

import graft.operators.SphericalKMeans

/** Invariants for spherical k-means: unit centroids, magnitude
  * invariance, argmax-cosine assignment, renormalized-mean M-step, and
  * zero-norm row handling.
  */
class SphericalKMeansSpec extends SparkSpec {
  import spark.implicits._

  private def norm(v: Seq[Double]): Double =
    math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x))

  test("fit returns unit centroids; M-step is the renormalized mean") {
    // two tight direction bundles; magnitudes vary wildly on purpose
    val pts = Seq(
      (1L, Seq(10.0, 0.1)), (2L, Seq(2.0, 0.0)), (3L, Seq(40.0, -0.2)),
      (4L, Seq(0.1, 5.0)), (5L, Seq(-0.1, 9.0)), (6L, Seq(0.0, 0.5)))
      .toDF("id", "v")
    val cents = SphericalKMeans
      .fitDeterministic(pts, "id", "v", k = 2, rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(cents.size == 2)
    cents.values.foreach(c => assert(math.abs(norm(c) - 1.0) < 1e-12))
    // each centroid must match the renormalized mean of ITS assigned
    // unit vectors (computed independently here)
    val assign = SphericalKMeans
      .assign(pts, "id", "v", cents.toSeq.sortBy(_._1).map(_._2.toArray).toArray)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val unit = pts.collect()
      .map(r => r.getLong(0) -> {
        val v = r.getSeq[Double](1); val n = norm(v); v.map(_ / n)
      })
      .toMap
    cents.foreach { case (c, cv) =>
      val members = assign.collect { case (id, cc) if cc == c => unit(id) }.toSeq
      assert(members.nonEmpty)
      val mean = members.transpose.map(xs => xs.sum / members.size)
      val mn = norm(mean)
      mean.map(_ / mn).zip(cv).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
  }

  test("scaling any input vector changes (almost) nothing") {
    // mathematically exact invariance; floating-point normalization of
    // the scaled copies differs in final ulps, so compare to 1e-12
    val base = Seq(
      (1L, Seq(1.0, 0.2, 0.0)), (2L, Seq(0.9, 0.0, 0.1)),
      (3L, Seq(0.0, 1.0, 0.3)), (4L, Seq(0.1, 0.8, 0.0)))
    val scaled = base.map { case (id, v) =>
      (id, v.map(_ * (1.0 + id % 3 * 100.0)))
    }
    def fit(rows: Seq[(Long, Seq[Double])]) = SphericalKMeans
      .fitDeterministic(rows.toDF("id", "v"), "id", "v", k = 2, rounds = 2)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val a = fit(base)
    val b = fit(scaled)
    assert(a.keySet == b.keySet)
    a.foreach { case (key, x) => assert(math.abs(x - b(key)) < 1e-12) }
  }

  test("assignment is argmax cosine with lowest-index ties") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = SphericalKMeans
      .assign(
        Seq((1L, Seq(3.0, 1.0)), (2L, Seq(1.0, 4.0)), (3L, Seq(5.0, 5.0)))
          .toDF("id", "v"),
        "id", "v", cents)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 0L), (2L, 1L), (3L, 0L))) // exact diagonal tie -> cluster 0
    got.foreach { case (id, c, sim) =>
      val v = Map(1L -> Seq(3.0, 1.0), 2L -> Seq(1.0, 4.0),
        3L -> Seq(5.0, 5.0))(id)
      val n = norm(v)
      val want = v.map(_ / n).zip(cents(c.toInt)).map { case (a, b) => a * b }.sum
      assert(math.abs(sim - want) < 1e-12)
    }
  }

  test("zero-norm rows are dropped, not propagated as NaN") {
    val got = SphericalKMeans
      .assign(
        Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 0.0))).toDF("id", "v"),
        "id", "v", Array(Array(1.0, 0.0)))
      .collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L))
  }
}
