package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators._
import graft.queries.Q

/** Binary quantization: packing/threshold invariants, kernel Hamming ==
  * long-form bit disagreement, and the codec plugged into distributed
  * HNSW through the same VectorCompression boundary as PQ/SQ (1 bit per
  * dimension is the coarsest codec — the gate is correspondingly loose).
  */
class BQSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Q.t(spark, sf0001, "embeddings")
    .select(col("vec_id"), toDouble(col("embedding")).as("vec"))

  test("packing round-trip: word bits reproduce the strict threshold rule") {
    val model = BinaryQuantizer.train(emb, "vec")
    val vs = emb.limit(50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    vs.foreach { case (id, v) =>
      val code = model.encodeVec(v)
      (0 until model.d).foreach { j =>
        val bit = (code(j / 16) >> (j % 16)) & 1
        val expected = if (v(j) > model.threshold(j)) 1 else 0
        assert(bit == expected, s"vec $id dim $j")
      }
    }
  }

  test("hamming == number of disagreeing bits; zero on self") {
    val m = BQModel(Array.fill(40)(0.0), Array.fill(40)(1.0)) // thr = 0.5, 3 words
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val a = Array.fill(40)(rnd.nextDouble())
      val b = Array.fill(40)(rnd.nextDouble())
      val ca = m.encodeVec(a)
      val cb = m.encodeVec(b)
      val longForm = (0 until 40).count(j => (a(j) > 0.5) != (b(j) > 0.5))
      assert(m.hamming(ca, cb) == longForm)
      assert(m.hamming(ca, ca) == 0)
    }
  }

  test("BQCompression short codes: masked hamming matches the int kernel") {
    val model = BinaryQuantizer.train(emb, "vec")
    val comp = new BQCompression(model)
    val vs = emb.limit(20).collect().map(_.getSeq[Double](1).toArray)
    for (a <- vs.take(5); b <- vs) {
      val viaShort = comp.distance(comp.encode(a), comp.encode(b))
      val viaInt = model.hamming(model.encodeVec(a), model.encodeVec(b))
      assert(viaShort == viaInt.toDouble)
    }
    // decode lands strictly inside each dimension's half-range
    val dec = comp.decode(comp.encode(vs(0)))
    (0 until model.d).foreach { j =>
      assert(dec(j) >= model.lo(j) && dec(j) <= model.hi(j))
    }
  }

  test("knn_bq_rerank: exact rerank recall >= hamming-only recall, floor 0.5") {
    val exact = BruteForceKNN.knn(
      emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("query_id"), col("vec").as("qv")),
      emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")),
      5
    ).select(col("query_id"), col("neighbor_id"))
    val denom = exact.count().toDouble
    def recallOf(name: String): Double =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .count() / denom
    val hamming = recallOf("bq_hamming_topk")
    val rerank = recallOf("knn_bq_rerank")
    // the 30-deep Hamming shortlist + exact rerank can only refine the
    // 1-bit ranking; floor is data-honest for 64-bit codes on random 64-d
    assert(rerank >= hamming, s"rerank $rerank < hamming-only $hamming")
    assert(rerank >= 0.5, s"rerank recall@5 too low: $rerank")
  }

  test("rabitq estimator: unbiased-ish on real pairs, recall beats raw-Hamming serving") {
    // recompute the estimator columns exactly as bq_rabitq_rerank does
    def rot(c: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(63)), p =>
        when(p % 5 === 0, lit(-1.0)).otherwise(lit(1.0)) *
          element_at(c, p * 37 % 64 + 1))
    val fast = graft.functions.VectorExpressions
    val docs = emb
      .withColumn("r", rot(col("vec")))
      .select(
        col("vec_id").as("nid"), col("vec").as("bv"),
        expr("transform(r, x -> IF(x > 0D, 1D, -1D))").as("sgn"),
        fast.dotFast(col("vec"), col("vec")).as("n2x"),
        expr("aggregate(r, 0D, (acc, x) -> acc + abs(x))").as("sx"))
      .withColumn("nx", sqrt(col("n2x")))
      .withColumn("corr", col("sx") / (col("nx") * lit(8.0)))
    val pairs = docs
      .join(broadcast(
        emb.filter(col("vec_id") % 10 === 0)
          .withColumn("rq", rot(col("vec")))
          .select(col("vec_id").as("query_id"), col("vec").as("qv"), col("rq"))))
      .withColumn("s", fast.dotFast(col("sgn"), col("rq")))
      .withColumn("est", col("nx") * (col("s") / lit(8.0)) / col("corr"))
      .withColumn("truth", fast.dotFast(col("qv"), col("bv")))
    val stats = pairs.agg(
      avg(col("est") - col("truth")).as("bias"),
      avg(abs(col("truth"))).as("scale"),
      corr(col("est"), col("truth")).as("r")
    ).head
    val (bias, scale, r) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    // the geometric correction keeps the estimator centered: mean signed
    // error well under the mean magnitude, and strongly correlated
    assert(math.abs(bias) <= 0.1 * scale, s"bias $bias vs scale $scale")
    assert(r >= 0.5, s"estimator correlation $r")

    // serving comparison: distance-unit estimator shortlist + exact
    // rerank must not lose to raw-Hamming top-k serving
    val exact = BruteForceKNN.knn(
      emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("query_id"), col("vec").as("qv")),
      emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")),
      5
    ).select(col("query_id"), col("neighbor_id"))
    val denom = exact.count().toDouble
    def recallOf(name: String): Double =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .count() / denom
    val rabit = recallOf("bq_rabitq_rerank")
    val hamming = recallOf("bq_hamming_topk")
    assert(rabit >= hamming, s"rabitq $rabit < hamming $hamming")
    assert(rabit >= 0.6, s"rabitq recall@5 too low: $rabit")
  }

  test("HNSW+BQ through the VectorCompression boundary: Recall@10 >= 0.2") {
    val comp = new BQCompression(BinaryQuantizer.train(emb, "vec"))
    val shards = DistributedHnsw.build(
      emb, "vec_id", "vec", HnswParams(m = 16, efConstruction = 100),
      numShards = 2, seed = 7, compression = Some(comp))
    assert(shards.codes.isDefined)
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val approx = DistributedHnsw.search(
      shards, queries, "query_id", "qv", k = 10, compression = Some(comp))
    val exact = BruteForceKNN.knn(
      queries, emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 10)
    val nQ = queries.count()
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .intersect(exact.select(col("query_id"), col("neighbor_id"))).count()
    val recall = hits.toDouble / (nQ * 10)
    shards.unpersist()
    // 1 bit/dim on near-random 64-d data: the Hamming surrogate keeps
    // only coarse structure — gate well above chance (10/800 ≈ 0.0125)
    assert(recall >= 0.2, s"BQ recall $recall")
  }
}
