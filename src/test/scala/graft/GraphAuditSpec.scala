package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphAudit

/** Invariants for the graph-audit tier: triangles / clustering
  * coefficient, h-index coreness, modularity, assortativity.
  */
class GraphAuditSpec extends SparkSpec {
  import spark.implicits._

  // K4 on {0..3} plus a pendant 4—0 and an isolated 5
  private def k4Edges =
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L), (4L, 0L))
      .toDF("src", "dst")
  private def k4Ids = (0L to 5L).toDF("id")

  test("triangles: K4 + pendant — counts, cc, isolated zero") {
    val got = GraphAudit.triangleStats(k4Edges, k4Ids)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // node 0: deg 4 (K4 + pendant), in all 3 triangles through it
    assert(got(0L) == ((4L, 3L, 2.0 * 3 / (4 * 3))))
    // nodes 1..3: deg 3, 3 triangles each, cc = 1
    (1L to 3L).foreach(i => assert(got(i) == ((3L, 3L, 1.0)), s"node $i ${got(i)}"))
    assert(got(4L) == ((1L, 0L, 0.0)))
    assert(got(5L) == ((0L, 0L, 0.0)))
    // total triangle mass: K4 has 4 triangles, each counted at 3 corners
    assert(got.values.map(_._2).sum == 12L)
  }

  test("scan: two bridged cliques — cores, border, hub, outlier, cluster reps closed-form") {
    // clique A = {1,2,3,4}, clique B = {5,6,7,8}, bridge 9—(1,5),
    // tassel 10—(2,3), isolated 11. With ε=0.7, μ=4 (hand-checked σ):
    //   in-clique edges all σ ≥ 0.775 → every clique node is a core;
    //   (9,1)/(9,5) score σ=2/√15≈0.516 → 9 has no ε-edge, but its
    //   neighbors sit in both clusters → HUB;
    //   10's edges score 3/√15≈0.775 → ε-similar to cores 2,3 but
    //   n_eps(10)=3 < μ → BORDER of cluster A;
    //   11 has no edges → OUTLIER.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (9L, 1L), (9L, 5L), (10L, 2L), (10L, 3L)
    ).toDF("src", "dst")
    val ids = (1L to 11L).toDF("id")
    val got = GraphAudit
      .scan(edges, ids, epsSqNum = 49L, epsSqDen = 100L, mu = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    (1L to 4L).foreach(i => assert(got(i) == (("core", 1L)), s"$i ${got(i)}"))
    (5L to 8L).foreach(i => assert(got(i) == (("core", 5L)), s"$i ${got(i)}"))
    assert(got(9L) == (("hub", -1L)), s"9 ${got(9L)}")
    assert(got(10L) == (("border", 1L)), s"10 ${got(10L)}")
    assert(got(11L) == (("outlier", -1L)), s"11 ${got(11L)}")
  }

  test("scan: partition/direction invariance; stricter eps only demotes") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (9L, 1L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    val ids = (1L to 10L).toDF("id")
    val a = GraphAudit.scan(edges, ids, 49L, 100L, 4)
      .orderBy("id").collect().toSeq
    val b = GraphAudit
      .scan(
        edges.unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
          .repartition(5),
        ids.repartition(3), 49L, 100L, 4)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // raising eps to 1.0 (only σ=1 edges survive) can only shrink the
    // member set — no node may gain a cluster
    val strict = GraphAudit.scan(edges, ids, 100L, 100L, 4)
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    val loose = GraphAudit.scan(edges, ids, 49L, 100L, 4)
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(strict.forall { case (k, sNull) => sNull || !loose(k) },
      "a node gained a cluster when eps tightened")
  }

  test("scan curve semantics: cores monotone non-increasing as eps tightens; roles partition the universe") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (9L, 1L), (9L, 5L), (10L, 2L), (10L, 3L)).toDF("src", "dst")
    val ids = (1L to 11L).toDF("id")
    val byEps = Seq(25L, 49L, 81L).map { num =>
      val rows = GraphAudit.scan(edges, ids, num, 100L, 4).collect()
      assert(rows.length == 11, s"eps2=$num: roles must partition the universe")
      num -> rows.count(_.getString(2) == "core")
    }
    val cores = byEps.map(_._2)
    assert(cores.zip(cores.tail).forall { case (a, b) => a >= b },
      s"core count not monotone in eps: $byEps")
  }

  test("conductance: bridged cliques closed-form; singleton fallback; perfect split") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (9L, 1L), (9L, 5L)).toDF("src", "dst")
    val ids = (1L to 9L).toDF("id")
    // communities: A = {1..4, 9} (comm 0), B = {5..8} (comm 1)
    // vol(A) = 4+3+3+3+2 = 15, vol(B) = 13, tvol = 28, cut = 1 each side
    val comm = ((1L to 4L).map(_ -> 0L) ++ (5L to 8L).map(_ -> 1L)
      :+ (9L -> 0L)).toDF("id", "community")
    val got = GraphAudit.conductance(edges, ids, comm)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(0L) == ((5L, 15L, 1L,
      math.rint(1.0 / 13 * 1e6) / 1e6)))
    assert(got(1L) == ((4L, 13L, 1L,
      math.rint(1.0 / 13 * 1e6) / 1e6)))
    // node 9 absent from the assignment → singleton under the
    // non-colliding key −(9+1) = −10 (NOT its raw id, which could merge
    // into a genuine label community): vol 2, both edges cross → phi = 1
    val partial = ((1L to 4L).map(_ -> 0L) ++ (5L to 8L).map(_ -> 1L))
      .toDF("id", "community")
    val g2 = GraphAudit.conductance(edges, ids, partial)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(g2(-10L) == 1.0)
    assert(!g2.contains(9L))
    // collision probe: a community genuinely LABELED 9 must not absorb
    // the missing node 9 — label-9 community {1..4} keeps vol 13, and
    // the singleton stays separate
    val label9 = ((1L to 4L).map(_ -> 9L) ++ (5L to 8L).map(_ -> 1L))
      .toDF("id", "community")
    val g2c = GraphAudit.conductance(edges, ids, label9)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(g2c(9L) == ((4L, 13L)))   // labeled community: only nodes 1..4
    assert(g2c(-10L) == ((1L, 2L))) // node 9 rides its own singleton key
    // two disconnected cliques split perfectly → phi = 0 both
    val disc = edges.filter(col("src") =!= 9L)
    val g3 = GraphAudit.conductance(disc, (1L to 8L).toDF("id"), partial)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(g3(0L) == 0.0 && g3(1L) == 0.0)
  }

  test("wedge-artifact reuse: scan / triangles / conductance off WedgeStats equal the direct builds") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L),
      (9L, 1L), (9L, 5L)).toDF("src", "dst")
    val ids = (1L to 10L).toDF("id") // 10 isolated: deg 0 must survive
    val stats = GraphAudit.wedgeStats(edges, ids)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(GraphAudit.scan(stats, 9L, 100L, 3)) ==
      rows(GraphAudit.scan(edges, ids, 9L, 100L, 3)))
    assert(rows(GraphAudit.triangleStats(stats)) ==
      rows(GraphAudit.triangleStats(edges, ids)))
    val comm = ((1L to 4L).map(_ -> 0L) ++ (5L to 8L).map(_ -> 1L))
      .toDF("id", "community")
    assert(rows(GraphAudit.conductance(stats, comm)) ==
      rows(GraphAudit.conductance(edges, ids, comm)))
  }

  test("triangles: direction/duplication of the input edge list is irrelevant") {
    val doubled = k4Edges.unionAll(
      k4Edges.select(col("dst").as("src"), col("src").as("dst")))
    val a = GraphAudit.triangleStats(k4Edges, k4Ids).orderBy("id").collect().toSeq
    val b = GraphAudit.triangleStats(doubled.repartition(7), k4Ids)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  /** Independent ground truth: classic iterative peeling. */
  private def peelCoreness(edges: Seq[(Long, Long)], ids: Seq[Long]): Map[Long, Int] = {
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    ids.foreach(i => adj(i) = scala.collection.mutable.Set.empty)
    edges.foreach { case (a, b) =>
      if (a != b) { adj(a) += b; adj(b) += a }
    }
    val core = scala.collection.mutable.Map.empty[Long, Int]
    val alive = scala.collection.mutable.Set(ids: _*)
    var k = 0
    while (alive.nonEmpty) {
      var changed = true
      while (changed) {
        changed = false
        alive.toSeq.foreach { v =>
          if (adj(v).count(alive) <= k && alive(v)) {
            core(v) = k; alive -= v; changed = true
          }
        }
      }
      k += 1
    }
    core.toMap
  }

  test("coreness: h-index iteration converges to peel coreness") {
    // K4 (core 3) + pendant (core 1) + isolated (core 0) + a 4-cycle (core 2)
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L), (4L, 0L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val ids = (0L to 5L) ++ (10L to 13L)
    val truth = peelCoreness(edges, ids)
    val got = GraphAudit
      .coreness(edges.toDF("src", "dst"), ids.toDF("id"), rounds = 6)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2).toInt)
      .toMap
    ids.foreach(i => assert(got(i) == truth(i), s"node $i got ${got(i)} want ${truth(i)}"))
  }

  test("coreness: fixed schedule is monotone non-increasing across rounds") {
    val edges = k4Edges
    val r1 = GraphAudit.coreness(edges, k4Ids, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val r3 = GraphAudit.coreness(edges, k4Ids, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    r1.keys.foreach(i => assert(r3(i) <= r1(i), s"node $i $r1 $r3"))
  }

  test("modularity: two cliques with one bridge — strong positive Q; sums check") {
    // two K3s {0,1,2} {10,11,12} bridged 2—10
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L)).toDF("src", "dst")
    val ids = Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("id")
    val comm = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("id", "community")
    val rows = GraphAudit.modularity(edges, ids, comm).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val m = 7.0
    // community 0: e_in 3, deg_sum 7 (node 2 has deg 3)
    assert(rows(0L)._1 == 3L && rows(0L)._2 == 3L && rows(0L)._3 == 7L)
    assert(math.abs(rows(0L)._4 - (3 / m - math.pow(7 / (2 * m), 2))) < 1e-15)
    val q = rows.values.map(_._4).sum
    assert(q > 0.3, s"bridged-cliques Q should be strongly positive, got $q")
    // degenerate one-community partition has Q = 0
    val one = Seq(0L, 1L, 2L, 10L, 11L, 12L).map(i => (i, 0L)).toDF("id", "community")
    val q1 = GraphAudit.modularity(edges, ids, one).agg(sum("q")).head.getDouble(0)
    assert(math.abs(q1) < 1e-15, s"single community Q must be 0, got $q1")
  }

  test("modularity: universe members absent from the assignment become singletons") {
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val ids = Seq(0L, 1L, 7L).toDF("id")
    val comm = Seq((0L, 0L), (1L, 0L)).toDF("id", "community")
    val rows = GraphAudit.modularity(edges, ids, comm).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 7L))
    val sing = rows.find(_.getLong(0) == 7L).get
    assert(sing.getLong(1) == 1L && sing.getLong(2) == 0L && sing.getDouble(4) == 0.0)
  }

  test("assortativity: star is -1, cycle-of-equal-degrees is degenerate-free +") {
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val ids = (0L to 6L).toDF("id")
    val r = GraphAudit.assortativity(star, ids).head
    assert(r.getLong(0) == 12L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-12, s"star r ${r.getDouble(1)}")
  }

  test("adamic-adar: closed form on a wedge graph; adjacent pairs excluded") {
    // path 1—0—2 plus edge 3—0: all pairs among {1,2,3} share only
    // neighbor 0 (deg 3) → score 1/ln(3); pair (0, x) are edges → absent
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val ids = (0L to 3L).toDF("id")
    val got = GraphAudit.adamicAdar(edges, ids, topN = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"${got.keySet}")
    val want = 1.0 / math.log(3.0)
    got.values.foreach { case (nc, s) =>
      assert(nc == 1L)
      assert(math.abs(s - want) < 1e-12, s"$s vs $want")
    }
  }

  test("adamic-adar: hub cap removes hub-only wedges; scores stack per neighbor") {
    // hub 9 — {0,1,2,3}, plus 0—1 and a private common neighbor 5 of
    // (0, 2). Uncapped: (0,2) scores 1/ln(4) + 1/ln(2) (hub + private),
    // other hub pairs score 1/ln(4); capped below the hub degree, only
    // (0,2) survives via the private neighbor
    val edges = ((0L to 3L).map(i => (9L, i)) ++ Seq((0L, 1L), (5L, 0L), (5L, 2L)))
      .toDF("src", "dst")
    val ids = (Seq(5L, 9L) ++ (0L to 3L)).toDF("id")
    val full = GraphAudit.adamicAdar(edges, ids, topN = 100)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val ln2 = 1.0 / math.log(2.0) // private neighbors 5 (deg 2) and 2 (deg 2)
    val ln3 = 1.0 / math.log(3.0) // node 0 (deg 3: 9, 1, 5)
    val ln4 = 1.0 / math.log(4.0) // hub 9 (deg 4)
    assert(full.keySet == Set(
      (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L), // via the hub
      (5L, 9L), (1L, 5L))) // via 0 (and 2 for (5,9))
    // scores route through DECIMAL(38,20) per term — compare to 1e-12
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(full((0L, 2L))._1 == 2L &&
      close(full((0L, 2L))._2, ln4 + ln2), s"${full((0L, 2L))}") // hub + 5
    assert(full((5L, 9L))._1 == 2L &&
      close(full((5L, 9L))._2, ln3 + ln2), s"${full((5L, 9L))}") // 0 + 2
    assert(full((1L, 5L))._1 == 1L && close(full((1L, 5L))._2, ln3))
    assert(full((2L, 3L))._1 == 1L && close(full((2L, 3L))._2, ln4))
    // the richest pair ranks first: (5,9) = 1/ln3 + 1/ln2 beats
    // (0,2) = 1/ln4 + 1/ln2
    val top = GraphAudit.adamicAdar(edges, ids, topN = 1).head
    assert((top.getLong(0), top.getLong(1)) == ((5L, 9L)), s"$top")
    // cap below the hub degree: only wedges through 0, 2, 5 remain
    val capped = GraphAudit.adamicAdar(edges, ids, topN = 100, maxHubDeg = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(capped.keySet == Set((0L, 2L), (5L, 9L), (1L, 5L)), s"${capped.keySet}")
    assert(close(capped((0L, 2L)), ln2)) // the hub term is gone
    assert(close(capped((5L, 9L)), ln3 + ln2))
    assert(close(capped((1L, 5L)), ln3))
  }

  test("cluster_hierarchy: levels nest, coarsen, and actually merge") {
    val rows = SparkEntry.queries("cluster_hierarchy")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // single-linkage nesting: same fine component ⇒ same mid component,
    // same mid ⇒ same coarse
    rows.groupBy(_._2).values.foreach(g =>
      assert(g.map(_._3).distinct.length == 1, s"fine cluster split at mid: $g"))
    rows.groupBy(_._3).values.foreach(g =>
      assert(g.map(_._4).distinct.length == 1, s"mid cluster split at coarse: $g"))
    val (nf, nm, nc) = (rows.map(_._2).distinct.length,
      rows.map(_._3).distinct.length, rows.map(_._4).distinct.length)
    assert(nf >= nm && nm >= nc, s"level sizes $nf/$nm/$nc not monotone")
    assert(nc < rows.length, "coarse level never merged anything")
  }

  test("percolation: components shrink and the giant component grows up the cuts") {
    val rows = SparkEntry.queries("knn_graph_percolation")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq("fine", "mid", "coarse"))
    val byLevel = rows.map(t => t._1 -> t).toMap
    val Seq(f, m, c) = Seq("fine", "mid", "coarse").map(byLevel)
    // coarser cut = superset of edges: fewer components, larger giant
    assert(f._2 >= m._2 && m._2 >= c._2, s"component counts not monotone: $rows")
    assert(f._4 <= m._4 && m._4 <= c._4, s"giant fraction not monotone: $rows")
    rows.foreach { t =>
      assert(t._4 > 0.0 && t._4 <= 1.0, s"giant_frac out of range: $t")
      assert(t._3 >= 1L && t._2 >= 1L)
    }
  }

  test("assortativity: partition invariance") {
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L), (4L, 0L), (5L, 4L))
      .toDF("src", "dst")
    val ids = (0L to 5L).toDF("id")
    val a = GraphAudit.assortativity(edges, ids).head.getDouble(1)
    val b = GraphAudit.assortativity(edges.repartition(13), ids).head.getDouble(1)
    assert(a == b)
  }

  test("trussTrajectory: K4 survives 4-truss, pendant and triangle peel away") {
    // K4 + pendant edge + disjoint triangle, k = 4 (support >= 2)
    val k4 = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L))
    val extra = Seq((3L, 9L), (20L, 21L), (21L, 22L), (20L, 22L))
    val e = (k4 ++ extra).toDF("src", "dst")
    val got = GraphAudit.trussTrajectory(e, k = 4, rounds = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // round 0: all 10 edges, 8 nodes; round 1: pendant (support 0) and
    // the triangle (support 1) peel, K4 survives (support 2 each)
    assert(got(0) == (0L, 10L, 8L))
    assert(got(1) == (1L, 6L, 4L))
    // fixpoint: K4 is a 4-truss, censuses stay flat
    assert(got(2) == (2L, 6L, 4L) && got(3) == (3L, 6L, 4L))
    // monotone non-increasing always
    assert(got.sliding(2).forall { case Array(p, n) => n._2 <= p._2 })
    // k = 5 (support >= 3): even K4 dies
    val g5 = GraphAudit.trussTrajectory(e, k = 5, rounds = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(g5.last._2 == 0L)
  }

  test("double-sweep BFS reaches the true diameter endpoint on path fixtures") {
    // path 0-..-7: BFS from 0 -> farthest is 7 (ecc 7); BFS from 7 ->
    // max hop 7 = the exact diameter (double sweep is exact on trees)
    val path = (0L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val b1 = GraphAudit.multiSourceBfs(path, Seq(0L).toDF("v"), rounds = 7)
      .as[(Long, Long, Int)].collect()
    val far = b1.maxBy(r => (r._3, -r._2))
    assert(far._2 == 7L && far._3 == 7)
    val b2 = GraphAudit
      .multiSourceBfs(path, Seq(far._2).toDF("v"), rounds = 7)
      .as[(Long, Long, Int)].collect()
    assert(b2.map(_._3).max == 7, "second sweep must recover the diameter")
    // asymmetric tree: seed inside, sweep must still find the long arm
    val tree = (Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)) ++
      Seq((0L, 10L))).toDF("src", "dst")
    val t1 = GraphAudit.multiSourceBfs(tree, Seq(1L).toDF("v"), rounds = 6)
      .as[(Long, Long, Int)].collect()
    val u = t1.sortBy(r => (-r._3, r._2)).head
    assert(u._2 == 4L && u._3 == 3)
    val t2 = GraphAudit.multiSourceBfs(tree, Seq(u._2).toDF("v"), rounds = 6)
      .as[(Long, Long, Int)].collect()
    assert(t2.map(_._3).max == 5, "4 -> 10 is the true diameter path")
  }

  test("betweennessBrandes: path and star closed forms, pivot subset, non-interior zeros") {
    val ids5 = (0L to 4L).toDF("id")
    // path 0-1-2-3-4, all-source exact Brandes: bw counts ORDERED
    // (s, t) pairs routed through v -> (1,6,8,6,1)... wait: bw(1) =
    // pairs through 1: (0,2),(0,3),(0,4) + reverses = 6; bw(0) = 0.
    val path = (0L to 3L).map(i => (i, i + 1)).toDF("src", "dst")
    val bwPath = GraphAudit
      .betweennessBrandes(path, ids5.select(col("id").as("vec_id")), ids5, rounds = 4)
      .as[(Long, Double)].collect().toMap
    assert(bwPath == Map(0L -> 0.0, 1L -> 6.0, 2L -> 8.0, 3L -> 6.0, 4L -> 0.0))
    // star: center 0, leaves 1..4 -> bw(center) = k(k-1) = 12, leaves 0
    val star = (1L to 4L).map(l => (0L, l)).toDF("src", "dst")
    val bwStar = GraphAudit
      .betweennessBrandes(star, ids5.select(col("id").as("vec_id")), ids5, rounds = 2)
      .as[(Long, Double)].collect().toMap
    assert(bwStar == Map(0L -> 12.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0))
    // single pivot 0 on the path: delta_0 = (#targets beyond v) per v
    val bw0 = GraphAudit
      .betweennessBrandes(path, Seq(0L).toDF("vec_id"), ids5, rounds = 4)
      .as[(Long, Double)].collect().toMap
    assert(bw0 == Map(0L -> 0.0, 1L -> 3.0, 2L -> 2.0, 3L -> 1.0, 4L -> 0.0))
    // diamond 0-1-3, 0-2-3: two shortest 0->3 paths split sigma; from
    // pivot 0, delta(1) = delta(2) = 1/2 (+ nothing else at horizon 2)
    val diamond = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val ids4 = (0L to 3L).toDF("id")
    val bwD = GraphAudit
      .betweennessBrandes(diamond, Seq(0L).toDF("vec_id"), ids4, rounds = 2)
      .as[(Long, Double)].collect().toMap
    assert(bwD(1L) == 0.5 && bwD(2L) == 0.5 && bwD(0L) == 0.0 && bwD(3L) == 0.0)
  }

  test("multiSourceBfs: exact hops on a path, min-hop uniqueness, direction invariance") {
    // path 0-1-2-...-7 plus a shortcut 0-5
    val edges = ((0L to 6L).map(i => (i, i + 1)) :+ (0L, 5L)).toDF("src", "dst")
    val got = GraphAudit
      .multiSourceBfs(edges, Seq(0L).toDF("vec_id"), rounds = 3)
      .as[(Long, Long, Int)].collect()
    // hop(5) = 1 via the shortcut, hop(4) = 2 via 5, hop(3) = 3 (both sides)
    val hops = got.map { case (_, id, h) => id -> h }.toMap
    assert(hops == Map(
      0L -> 0, 1L -> 1, 5L -> 1, 2L -> 2, 4L -> 2, 6L -> 2, 3L -> 3, 7L -> 3))
    // each (source, node) appears exactly once - at its MINIMAL hop
    assert(got.length == got.map(r => (r._1, r._2)).distinct.length)
    // reversed edge directions give the identical table (undirected view)
    val rev = GraphAudit
      .multiSourceBfs(
        edges.select(col("dst").as("src"), col("src").as("dst")),
        Seq(0L).toDF("vec_id"), rounds = 3)
      .as[(Long, Long, Int)].collect()
    assert(rev.sorted.toSeq == got.sorted.toSeq)
    // two sources: rows are per-source independent censuses
    val two = GraphAudit
      .multiSourceBfs(edges, Seq(0L, 7L).toDF("vec_id"), rounds = 2)
      .as[(Long, Long, Int)].collect()
    assert(two.filter(_._1 == 7L).map(r => r._2 -> r._3).toMap ==
      Map(7L -> 0, 6L -> 1, 5L -> 2))
  }
}
