package graft

import org.apache.spark.sql.functions._

import graft.operators.FacilityLocation
import graft.queries.Q

/** Invariants for greedy facility-location exemplar selection. */
class FacilityLocationSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: picks the densest direction first, no re-picks") {
    // two tight direction bundles (axis x: ids 0,1,2,3; axis y: ids 10,20)
    // + pool = ids % 10 == 0 → candidates {0, 10, 20}. Axis-x candidate 0
    // represents 4 of 6 points perfectly → largest marginal gain; then an
    // axis-y candidate; a third pick must not repeat the first two.
    val df = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.01)), (2L, Seq(1.0, -0.01)),
      (3L, Seq(0.99, 0.0)), (10L, Seq(0.0, 1.0)), (20L, Seq(0.01, 1.0))
    ).toDF("id", "v")
    val got = FacilityLocation.greedy(df, "id", "v", k = 3, poolMod = 10L)
      .orderBy("rnd").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got(0)._1 == 0L, s"first pick should be the dense axis: $got")
    assert(Set(10L, 20L).contains(got(1)._1))
    assert(got.map(_._1).distinct.length == 3, "re-picked a candidate")
  }

  test("marginal gains are non-increasing (submodularity of greedy)") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val gains = FacilityLocation.greedy(emb, "vec_id", "v", k = 6, poolMod = 10L)
      .orderBy("rnd").collect().map(_.getDouble(2))
    gains.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"gain increased: $a -> $b")
    }
    assert(gains.forall(_ >= 0.0))
  }

  test("coverage: partitions the corpus, sims in [0,1], min <= mean") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = emb.count()
    val ids = FacilityLocation.greedy(emb, "vec_id", "v", k = 4, poolMod = 10L)
      .collect().map(_.getLong(1))
    val byId = emb.filter(col("vec_id").isin(ids: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val cov = FacilityLocation
      .coverage(emb, "vec_id", "v", ids.map(id => (id, byId(id))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(cov.map(_._2).sum == n, "attribution does not partition the corpus")
    cov.foreach { case (cid, att, mean, mn) =>
      assert(att >= 1, s"pick $cid attracts nothing")
      assert(mn >= 0.0 && mean <= 1.0 + 1e-9 && mn <= mean + 1e-9,
        s"coverage stats out of range for $cid: mean=$mean min=$mn")
    }
  }

  test("greedy prefixes agree; result is partition-invariant") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val full = FacilityLocation.greedy(emb, "vec_id", "v", k = 5, poolMod = 10L)
      .orderBy("rnd").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val short = FacilityLocation.greedy(emb, "vec_id", "v", k = 3, poolMod = 10L)
      .orderBy("rnd").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(short.toSeq == full.take(3).toSeq)
    val repart = FacilityLocation
      .greedy(emb.repartition(7), "vec_id", "v", k = 5, poolMod = 10L)
      .orderBy("rnd").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(repart.toSeq == full.toSeq)
  }
}
