package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{BruteForceKNN, IvfIndex}
import graft.queries.Q

/** IVF invariants: probing all cells is exactly brute force; fewer probes
  * return a subset of the candidate space with correct local ordering.
  */
class IvfSpec extends SparkSpec {

  private lazy val emb = Q.t(spark, sf0001, "embeddings")
    .select(col("vec_id"), toDouble(col("embedding")).as("vec"))

  private lazy val cents = emb
    .filter(col("vec_id") < 8)
    .orderBy(col("vec_id"))
    .collect()
    .map(_.getSeq[Double](1).toArray)

  private lazy val queries = emb
    .filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("query_id"), col("vec").as("qv"))

  test("nprobe = nCells reproduces exact brute-force top-k") {
    val base = IvfIndex.assign(spark, emb, "vec_id", "vec", cents)
    val ivf = IvfIndex
      .search(spark, base, queries, "query_id", "qv", cents, k = 10, nprobe = 8)
      .select("query_id", "neighbor_id", "dist", "rnk")
    val exact = BruteForceKNN
      .knn(queries, emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 10)
      .select("query_id", "neighbor_id", "dist", "rnk")
    assert(ivf.except(exact).count() == 0 && exact.except(ivf).count() == 0)
  }

  test("cell assignment is total and stable") {
    val base = IvfIndex.assign(spark, emb, "vec_id", "vec", cents)
    assert(base.count() == emb.count())
    assert(base.filter(col("cell") < 0 || col("cell") >= 8).count() == 0)
    // own centroid vectors land in their own cell
    val own = base.filter(col("id") < 8)
      .filter(col("id") =!= col("cell")).count()
    assert(own == 0)
  }

  test("nprobe=2 recall vs exact is substantial") {
    val base = IvfIndex.assign(spark, emb, "vec_id", "vec", cents)
    val ivf = IvfIndex
      .search(spark, base, queries, "query_id", "qv", cents, k = 10, nprobe = 2)
    val exact = BruteForceKNN
      .knn(queries, emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 10)
    val hits = ivf.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.45, s"ivf recall $recall")
  }
}
