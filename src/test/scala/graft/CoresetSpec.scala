package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset
import graft.queries.Q

/** Invariants for the k-center greedy coreset. */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("kCenterGreedy: hand-checked line fixture (order + radii)") {
    // line 0,1,2,10: seed = min id (at 0.0); farthest = 10.0 (r=100);
    // then md over {0,10}: 1 -> min(1,81)=1, 2 -> min(4,64)=4 -> pick 2
    val df = Seq(
      (0L, Seq(0.0)), (1L, Seq(1.0)), (2L, Seq(2.0)), (3L, Seq(10.0))
    ).toDF("id", "vec")
    val got = Coreset.kCenterGreedy(df, "id", "vec", k = 4)
      .orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, 0L, -1.0), (2L, 3L, 100.0), (3L, 2L, 4.0), (4L, 1L, 1.0)))
  }

  test("kCenterGreedy: coverage radius is non-increasing; prefixes agree") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val full = Coreset.kCenterGreedy(emb, "vec_id", "vec", k = 10)
      .orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Double.MaxValue else r.getDouble(2)))
    val radii = full.drop(1).map(_._3)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"coverage radius increased: $a -> $b")
    }
    // greedy prefix consistency: k=5 is exactly the first 5 rows of k=10
    val short = Coreset.kCenterGreedy(emb, "vec_id", "vec", k = 5)
      .orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Double.MaxValue else r.getDouble(2)))
    assert(short.toSeq == full.take(5).toSeq)
  }

  test("kCenterGreedy: lazy-batched rounds reproduce sequential greedy exactly") {
    // batch = 1 degenerates to one-pick-per-round sequential greedy (the
    // round's first pick is always the global argmax); larger buffers
    // must accept extra picks ONLY when provably the argmax — identical
    // output for every batch size, fewer cluster round-trips
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    def run(b: Int) = Coreset.kCenterGreedy(emb, "vec_id", "vec", k = 12, batch = b)
      .orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    val seq1 = run(1)
    assert(run(4) == seq1)
    assert(run(64) == seq1)
  }

  test("kCenterGreedy: batched rounds exact under heavy distance ties") {
    // duplicated points force md ties at the buffer cutoff — the strict
    // > cutoff rule must refetch rather than mis-order the id tie-break
    val base = (0L until 40L).map(i => (i, Seq((i % 5).toDouble, (i % 3).toDouble)))
    val df = base.toDF("id", "vec")
    def run(b: Int) = Coreset.kCenterGreedy(df, "id", "vec", k = 15, batch = b)
      .orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    val seq1 = run(1)
    assert(run(8) == seq1)
    assert(run(40) == seq1)
  }

  test("kCenterComposable: deterministic one-pass shards, constant-factor corpus cover") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val pts = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // true corpus coverage radius (max over points of min dist² to centers)
    def radius(centers: Seq[Long]): Double = {
      val cs = centers.map(pts)
      pts.values.map(v => cs.map(c => l2(v, c)).min).max
    }
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rnd").collect().map(_.getLong(1)).toSeq
    val seqIds = ids(Coreset.kCenterGreedy(emb, "vec_id", "vec", k = 8))
    val comp = Coreset.kCenterComposable(emb, "vec_id", "vec", k = 8, parts = 4)
    val compIds = ids(comp)
    assert(compIds.size == 8 && compIds.distinct.size == 8)
    // two-level composable selection stays within a small constant of
    // the sequential greedy's (itself 2-approx) cover
    val rs = radius(seqIds); val rc = radius(compIds)
    assert(rc <= 4.0 * rs, s"composable radius² $rc vs sequential $rs")
    // md5 shard => identical output under any input partitioning
    val rep = ids(Coreset.kCenterComposable(
      emb.repartition(13), "vec_id", "vec", k = 8, parts = 4))
    assert(rep == compIds, "composable selection depends on partitioning")
  }

  test("kCenterGreedy: k larger than n stops at n centers") {
    val df = Seq((7L, Seq(0.0)), (9L, Seq(3.0))).toDF("id", "vec")
    val got = Coreset.kCenterGreedy(df, "id", "vec", k = 10).collect()
    assert(got.length == 2)
  }
}
