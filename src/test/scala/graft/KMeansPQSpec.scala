package graft

import scala.util.Random

import graft.operators._

/** Ports of the reference's k-means / PQ accuracy tests
  * (py/test_pq.py:72-94 clustered centroids, py/test_pq.py:226-249
  * reconstruction bounds, py/test_pq.py:186-224 codebook round-trip).
  */
class KMeansPQSpec extends SparkSpec {
  import spark.implicits._

  /** 3 clusters at (0,10,20)·1⃗ + U[-1,1] noise, 10 points each. */
  private def clustered(d: Int, seed: Long): Array[Array[Double]] = {
    val rng = new Random(seed)
    (for {
      center <- Seq(0.0, 10.0, 20.0)
      _ <- 0 until 10
    } yield Array.fill(d)(center + (rng.nextDouble() * 2 - 1))).toArray
  }

  test("local k-means recovers clustered centroids within ±2 (py/test_pq.py:72-94)") {
    val data = clustered(4, seed = 42)
    val r = KMeansLocal.fit(data, k = 3, seed = 42)
    val found = r.centroids.map(_.head).sorted
    val expected = Seq(0.0, 10.0, 20.0)
    found.zip(expected).foreach { case (f, e) =>
      assert(math.abs(f - e) <= 2.0, s"centroid $f vs $e")
    }
    assert(r.inertia >= 0.0)
  }

  test("distributed k-means matches the same cluster structure") {
    val data = clustered(4, seed = 7)
    val df = data.toSeq.map(v => Tuple1(v.toSeq)).toDF("v")
    val r = KMeans.fit(df, "v", k = 3, seed = 7)
    val found = r.centroids.map(_.head).sorted
    Seq(0.0, 10.0, 20.0).zip(found).foreach { case (e, f) =>
      assert(math.abs(f - e) <= 2.0, s"centroid $f vs $e")
    }
  }

  test("parallelInit: deterministic, covers separated clusters, feeds fit") {
    import org.apache.spark.sql.functions.col
    val data = clustered(4, seed = 11)
    val df = data.zipWithIndex.toSeq
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "v")
    val i1 = KMeans.parallelInit(df, "id", "v", k = 3, seed = 5, rounds = 3)
    val i2 = KMeans.parallelInit(df, "id", "v", k = 3, seed = 5, rounds = 3)
    assert(i1.map(_.toSeq).toSeq == i2.map(_.toSeq).toSeq, "not deterministic")
    assert(i1.length == 3)
    // every true cluster center has an init centroid nearby: the ||
    // rounds give every point a coin, so no separated cluster is missed
    Seq(0.0, 10.0, 20.0).foreach { c =>
      val center = Array.fill(4)(c)
      val nearest = i1.map(KMeansLocal.l2Sq(_, center)).min
      assert(nearest <= 4.0 * 4, s"cluster at $c missed, d2=$nearest")
    }
    // and Lloyd from that init recovers the structure exactly like the
    // ++-seeded path
    val r = KMeans.fit(df, "v", k = 3, seed = 5, initCentroids = Some(i1))
    val found = r.centroids.map(_.head).sorted
    Seq(0.0, 10.0, 20.0).zip(found).foreach { case (e, f) =>
      assert(math.abs(f - e) <= 2.0, s"centroid $f vs $e")
    }
    // real-data smoke: k centroids out of the embeddings table
    val emb = graft.queries.Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val ri = KMeans.parallelInit(emb, "vec_id", "v", k = 8, seed = 42, rounds = 2)
    assert(ri.length == 8 && ri.map(_.toSeq).distinct.length == 8)
  }

  test("parallelInit: tiny input tops up to exactly k; empty input fails clearly") {
    import org.apache.spark.sql.functions.col
    // 3 points, k = 5: the candidate pool saturates below k and the
    // deterministic top-up must still hand fit() exactly k centroids
    val tiny = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)), (2L, Seq(20.0, 20.0))
    ).toDF("id", "v")
    val init = KMeans.parallelInit(tiny, "id", "v", k = 5, seed = 7, rounds = 2)
    assert(init.length == 5)
    // all 3 distinct points survive as centroids; repeats fill the rest
    assert(init.map(_.toSeq).distinct.length == 3)
    val empty = tiny.filter(col("id") < 0)
    val ex = intercept[IllegalArgumentException] {
      KMeans.parallelInit(empty, "id", "v", k = 2, seed = 7)
    }
    assert(ex.getMessage.contains("empty"))
  }

  test("seededSample: narrow plan (no sort/range shuffle), deterministic") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.queries.Q.t(spark, sf0001, "embeddings").select(col("embedding"))
    val s = KMeans.seededSample(vecs, 20, 42L)
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(!plan.contains("Sort "), plan)
    val a = s.collect().map(_.toString).toSeq
    val b = KMeans.seededSample(vecs, 20, 42L).collect().map(_.toString).toSeq
    assert(a == b, "seeded sample must be deterministic")
    assert(a.nonEmpty && a.length <= 20)
  }

  test("empty-cluster rule: k > distinct points keeps old centroids (py/pq.py:181-183)") {
    val data = Array.fill(6)(Array(1.0, 1.0)) // all identical
    val r = KMeansLocal.fit(data, k = 3, seed = 1)
    // no crash; the occupied cluster sits on the data point
    assert(r.centroids.exists(c => KMeansLocal.l2Sq(c, Array(1.0, 1.0)) < 1e-12))
  }

  test("ppInitDet/fitDeterministic: partition-invariant, distinct picks, covers separated clusters") {
    import org.apache.spark.sql.functions._
    val data = clustered(8, seed = 7).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
    val df = data.toDF("id", "vec")
    def picks(parts: Int) = KMeans
      .ppInitDet(df.repartition(parts), "id", "vec", k = 3)
      .orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val p2 = picks(2)
    // deterministic and partition-independent (md5 coins, no RNG)
    assert(p2 == picks(7), "init depends on partitioning")
    assert(p2.map(_._2).distinct.size == 3, s"duplicate picks: $p2")
    // D²-weighting on 3 well-separated blobs covers all 3 (each pick
    // after the first has ~99% of its mass off the chosen blobs; the
    // fixed coins make the outcome reproducible, so assert it fully)
    val blobs = p2.map { case (_, id) => id / 10 }.toSet
    assert(blobs.size == 3, s"picks missed a cluster: $p2")
    // rounds = 0 returns exactly the init vectors (pos is 1-based)
    val c0 = KMeans.fitDeterministic(df, "id", "vec", k = 3, rounds = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPick = data.toMap
    c0.foreach { case (c, pos, x) =>
      assert(x == byPick(p2(c.toInt)._2)(pos.toInt - 1))
    }
    // 2 Lloyd rounds land one centroid per true cluster center
    val fitted = KMeans.fitDeterministic(df, "id", "vec", k = 3, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum / 8.0).toMap
    val got = fitted.values.toSeq.sorted
    Seq(0.0, 10.0, 20.0).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1.0, s"centroid means $got")
    }
  }

  test("parallelInitDet: partition-invariant, k distinct picks, covers separated clusters") {
    import org.apache.spark.sql.functions._
    val data = clustered(8, seed = 11).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
    val df = data.toDF("id", "vec")
    def picks(parts: Int) = KMeans
      .parallelInitDet(df.repartition(parts), "id", "vec", k = 3,
        rounds = 2, oversampleFactor = 2)
      .orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val p2 = picks(2)
    assert(p2 == picks(7), "parallel init depends on partitioning")
    assert(p2.map(_._2).distinct.size == 3, s"duplicate picks: $p2")
    // D²·w-weighted reduction over 3 separated blobs covers all 3
    val blobs = p2.map { case (_, id) => id / 10 }.toSet
    assert(blobs.size == 3, s"picks missed a cluster: $p2")
    // the reduced init feeds the fixed-Lloyd half: 2 rounds land one
    // centroid per true cluster center
    val init = KMeans
      .parallelInitDet(df, "id", "vec", k = 3, rounds = 2,
        oversampleFactor = 2)
      .orderBy("rnd").collect().map(_.getSeq[Double](2).toArray)
    val fitted = KMeans.fitDeterministicFrom(df, "vec", init, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum / 8.0).toMap
    val got = fitted.values.toSeq.sorted
    Seq(0.0, 10.0, 20.0).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1.0, s"centroid means $got")
    }
  }

  test("md5Coin matches the column md5 coin spelling bit for bit") {
    import org.apache.spark.sql.functions._
    val ids = Seq(0L, 1L, 17L, 499L, 123456789L)
    val want = ids.map(id => KMeans.md5Coin(s"$id:kmllD:1"))
    val got = ids.toDF("id")
      .select(((graft.operators.Dedup.md5Long(
        concat(col("id").cast("string"), lit(":kmllD:1")))
        % 1000000 + 1).cast("double") / lit(1000001.0)).as("u"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == want, s"driver coin != column coin: $got vs $want")
  }

  test("PQ train/encode/decode reconstruction error bounded (py/test_pq.py:226-249)") {
    // patterned vectors [ (i%10)*0.1 ] * D
    val d = 16
    val data = (0 until 100).map(i => Array.fill(d)((i % 10) * 0.1))
    val df = data.map(v => Tuple1(v.toSeq)).toDF("v")
    val model = ProductQuantizer.train(df, "v", m = 4, k = 8, seed = 42)
    // the reference bounds the single test vector [0.5]*D at rel err < 0.2
    val v = Array.fill(d)(0.5)
    val rec = model.decodeCode(model.encodeVec(v))
    val err = math.sqrt(KMeansLocal.l2Sq(v, rec))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(err / norm < 0.2, s"rel err ${err / norm}")
  }

  test("ADC == L2Sq(q, decode(code)); SDC == L2Sq(decode(a), decode(b))") {
    val rng = new Random(3)
    val d = 8
    val data = Array.fill(50)(Array.fill(d)(rng.nextDouble()))
    val df = data.toSeq.map(v => Tuple1(v.toSeq)).toDF("v")
    val model = ProductQuantizer.train(df, "v", m = 2, k = 4, seed = 3)
    val q = Array.fill(d)(rng.nextDouble())
    val a = model.encodeVec(data(0))
    val b = model.encodeVec(data(1))
    assert(
      math.abs(model.adc(q, a) - KMeansLocal.l2Sq(q, model.decodeCode(a))) < 1e-12
    )
    assert(
      math.abs(
        model.sdc(a, b)
          - KMeansLocal.l2Sq(model.decodeCode(a), model.decodeCode(b))
      ) < 1e-12
    )
  }

  test("codebook save/load round-trip preserves encodes (py/test_pq.py:186-224)") {
    val rng = new Random(11)
    val d = 12
    val data = Array.fill(60)(Array.fill(d)(rng.nextDouble() * 5))
    val df = data.toSeq.map(v => Tuple1(v.toSeq)).toDF("v")
    val model = ProductQuantizer.train(df, "v", m = 3, k = 4, seed = 11)
    val path = java.nio.file.Files.createTempDirectory("cb").toString + "/cb"
    ProductQuantizer.saveCodebooks(spark, model, path)
    val loaded = ProductQuantizer.loadCodebooks(spark, path)
    assert(loaded.m == model.m && loaded.k == model.k && loaded.d == model.d)
    data.take(10).foreach { v =>
      assert(loaded.encodeVec(v).toSeq == model.encodeVec(v).toSeq)
    }
  }

  test("PQCompression adapter wires the four methods (py/vector_compression.py:97-135)") {
    val rng = new Random(5)
    val d = 8
    val data = Array.fill(40)(Array.fill(d)(rng.nextDouble()))
    val df = data.toSeq.map(v => Tuple1(v.toSeq)).toDF("v")
    val comp: VectorCompression =
      new PQCompression(ProductQuantizer.train(df, "v", m = 2, k = 4, seed = 5))
    val c0 = comp.encode(data(0))
    assert(comp.decode(c0).length == d)
    assert(comp.distance(c0, comp.encode(data(1))) >= 0.0)
    assert(comp.queryDistance(data(2), c0) >= 0.0)
  }

  test("partition-batched encode == column encode") {
    import org.apache.spark.sql.functions._
    val rng = new Random(17)
    val data = (0L until 80L).map(i => (i, Array.fill(8)(rng.nextDouble())))
    val df = data.toDF("id", "v")
    val model = ProductQuantizer.train(df, "v", m = 2, k = 4, seed = 17)
    val colWay = df.select(col("id"),
      ProductQuantizer.encodeCol(model, col("v")).as("code"))
    val partWay = ProductQuantizer.encodePartitioned(df, "id", "v", model)
    assert(colWay.except(partWay).count() == 0)
    assert(partWay.except(colWay).count() == 0)
  }

  test("PQ parameter grid: every (M,K,D) combination trains and round-trips (py/test_pq.py:251-268)") {
    val rng = new Random(29)
    for ((m, k, d) <- Seq((4, 8, 16), (2, 16, 8), (8, 16, 64), (16, 8, 64))) {
      val data = Array.fill(80)(Array.fill(d)(rng.nextDouble()))
      val df = data.toSeq.map(v => Tuple1(v.toSeq)).toDF("v")
      val model = ProductQuantizer.train(df, "v", m, k, seed = 29)
      assert(model.codebooks.length == m, s"(M=$m,K=$k,D=$d)")
      assert(model.codebooks.forall(_.length == k))
      assert(model.codebooks.forall(_.forall(_.length == d / m)))
      val code = model.encodeVec(data(0))
      assert(code.length == m && code.forall(c => c >= 0 && c < k))
      assert(model.decodeCode(code).length == d)
    }
  }
}
