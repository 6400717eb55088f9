package graft

import org.apache.spark.sql.functions._

import graft.operators.Dbscan
import graft.queries.Q

/** Invariants for the canonical-DBSCAN operator. */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  // two 4-point line clusters 1.0 apart (cores at minPts=4), one point
  // exactly between them (degree 3 -> border, in eps-range of BOTH
  // clusters — the min-attach case), one far point (noise). eps2 = 0.26
  // keeps the 0.5-spaced neighbor pairs inside eps despite binary
  // rounding of the decimal coordinates.
  private lazy val fixture = Seq(
    (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)),
    (3L, Seq(0.2, 0.0)), (4L, Seq(0.3, 0.0)),
    (11L, Seq(1.3, 0.0)), (12L, Seq(1.4, 0.0)),
    (13L, Seq(1.5, 0.0)), (14L, Seq(1.6, 0.0)),
    (21L, Seq(0.8, 0.0)),
    (31L, Seq(5.0, 5.0))
  ).toDF("id", "vec")

  test("dbscan: cores, min-id clusters, min-attach border, noise on a geometry fixture") {
    val got = Dbscan.dbscan(fixture, "id", "vec", eps2 = 0.26, minPts = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    for (i <- Seq(1L, 2L, 3L, 4L)) assert(got(i) == ("core", 1L), s"id $i: ${got(i)}")
    for (i <- Seq(11L, 12L, 13L, 14L)) assert(got(i) == ("core", 11L), s"id $i: ${got(i)}")
    // the between-clusters point sees cores of both; min-attach picks 1
    assert(got(21L) == ("border", 1L), s"border: ${got(21L)}")
    assert(got(31L) == ("noise", -1L), s"noise: ${got(31L)}")
  }

  test("epsNeighborPairs == naive all-pairs filter on real embeddings") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val naive = {
      val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      (for {
        (ia, va) <- rows; (ib, vb) <- rows
        if ia < ib
      } yield {
        var s = 0.0; var i = 0
        while (i < va.length) { val x = va(i) - vb(i); s += x * x; i += 1 }
        ((ia, ib), s)
      }).filter(_._2 <= 1.3).map(_._1).toSet
    }
    val got = Dbscan.epsNeighborPairs(emb, "id", "vec", eps2 = 1.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"extra=${got -- naive} missing=${naive -- got}")
  }

  test("epsNeighborPairsLsh: survivors are a subset of exact eps-pairs with useful recall") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val exact = Dbscan.epsNeighborPairs(emb, "id", "vec", eps2 = 1.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dbscan.epsNeighborPairsLsh(emb, "id", "vec", eps2 = 1.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-eps pairs: ${lsh -- exact}")
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.3,
      s"LSH eps-pair recall ${lsh.size}/${exact.size}")
  }

  test("dbscan partitions: every core's eps-neighbors that are core share its cluster") {
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val labeled = Dbscan.dbscan(emb, "id", "vec", eps2 = 1.3, minPts = 3)
    val byId = labeled.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val pairs = Dbscan.epsNeighborPairs(emb, "id", "vec", eps2 = 1.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      if (byId(a)._1 == "core" && byId(b)._1 == "core")
        assert(byId(a)._2 == byId(b)._2,
          s"core-core eps-pair ($a,$b) split across clusters")
    }
    // border points never carry a cluster no core neighbor has
    val coreClusters = byId.collect { case (_, ("core", c)) => c }.toSet
    byId.foreach { case (id, (role, c)) =>
      if (role == "border") assert(coreClusters.contains(c), s"border $id orphan cluster $c")
      if (role == "noise") assert(c == -1L, s"noise $id cluster $c")
    }
  }
}
