package graft

import org.apache.spark.sql.functions._

import graft.operators.{BruteForceKNN, LshKnn}
import graft.queries.Q

/** Invariants for SRP-LSH approximate top-k search: exact-cosine scores
  * on whatever it returns, self-retrieval, multi-probe ⊇ single-probe,
  * rank ordering, and a recall floor against exact kNN on real data.
  */
class LshKnnSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Q.t(spark, sf0001, "embeddings").select(
    col("vec_id"),
    graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))

  private def queries = emb
    .filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").as("query_id"), col("v").as("qv"))

  test("scores are the exact cosine; ranks ordered desc with id ties") {
    val got = LshKnn
      .knnLsh(emb, "vec_id", "v", queries, "query_id", "qv", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.nonEmpty)
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    got.foreach { case (q, n, sim, _) =>
      assert(math.abs(sim - cos(vecs(q), vecs(n))) < 1e-12)
    }
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1 to byRank.length))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
        case _ =>
      }
    }
  }

  test("a query always retrieves itself at rank 1") {
    val got = LshKnn
      .knnLsh(emb, "vec_id", "v", queries, "query_id", "qv", k = 3)
      .filter(col("rnk") === 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == queries.count())
    got.foreach { case (q, n, sim) =>
      assert(n == q, s"query $q rank-1 was $n")
      assert(math.abs(sim - 1.0) < 1e-12)
    }
  }

  test("multi-probe candidates are a superset of single-probe") {
    val mp = LshKnn
      .knnLsh(emb, "vec_id", "v", queries, "query_id", "qv",
        k = 1000, multiProbe = true)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sp = LshKnn
      .knnLsh(emb, "vec_id", "v", queries, "query_id", "qv",
        k = 1000, multiProbe = false)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp.subsetOf(mp))
    assert(mp.size > sp.size, "1-bit probes added no candidates")
  }

  test("probe curve: recall is monotone in the probe radius") {
    val curve = LshKnn
      .probeRecallCurve(emb, "vec_id", "v", queries, "query_id", "qv",
        k = 10, radii = Seq(0, 1, 2))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(0L, 1L, 2L))
    curve.sliding(2).foreach {
      case Array((_, lo), (_, hi)) =>
        assert(hi >= lo, s"recall not monotone: $lo -> $hi")
      case _ =>
    }
    // radius-2 probes 11 of the 16 band buckets — near-exhaustive
    assert(curve.last._2 >= 0.9, s"radius-2 recall ${curve.last._2}")
  }

  test("recall@10 against exact cosine kNN clears the floor") {
    val k = 10
    val approx = LshKnn
      .knnLsh(emb, "vec_id", "v", queries, "query_id", "qv", k = k)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = BruteForceKNN
      .knnCosine(queries,
        emb.select(col("vec_id").as("neighbor_id"), col("v").as("bv")), k)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("probeRecallCurve: the shared flip-tagged pass equals independent single-radius runs") {
    // the multi-radius curve generates ONE widest-radius probe table and
    // gates narrower radii by min flip count; this pins that hoist to
    // the per-radius calls (each of which IS the old per-radius
    // computation when radii has one element), row for row
    def run(radii: Seq[Int]) = LshKnn
      .probeRecallCurve(emb, "vec_id", "v", queries, "query_id", "qv",
        k = 10, radii = radii)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val multi = run(Seq(0, 1, 2))
    val singles = Seq(0, 1, 2).flatMap(r => run(Seq(r))).toSet
    assert(multi == singles,
      s"multi-radius pass diverged:\n  multi   $multi\n  singles $singles")
  }
}
