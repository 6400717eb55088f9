package graft

import org.apache.spark.sql.functions._

import graft.operators.Louvain

/** Invariants for synchronous Louvain phase-1: a hand-computed sync
  * round, clean convergence on disjoint cliques, isolated-node and
  * singleton behavior, and partition determinism.
  */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      edges: Seq[(Long, Long)],
      ids: Seq[Long],
      rounds: Int): Map[Long, Long] =
    Louvain
      .louvainSync(edges.toDF("src", "dst"), ids.toDF("id"), rounds)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("one synchronous round on a path matches the hand calculation") {
    // P3: 1-2-3, m=2, 2m=4; node 1 -> c2 (score 2), node 2 -> c1
    // (tie 2/2 with c3, min id), node 3 -> c2
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L), rounds = 1)
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("a symmetric pair oscillates — the documented synchronous trade") {
    // K2 swaps communities every round (both nodes move simultaneously);
    // real kNN graphs are asymmetric and settle (see the K4 test), but
    // the sync schedule makes NO convergence promise on symmetric
    // structures — pin the exact oscillation so the contract is visible
    val r1 = run(Seq((1L, 2L)), Seq(1L, 2L), rounds = 1)
    val r2 = run(Seq((1L, 2L)), Seq(1L, 2L), rounds = 2)
    val r3 = run(Seq((1L, 2L)), Seq(1L, 2L), rounds = 3)
    assert(r1 == Map(1L -> 2L, 2L -> 1L))
    assert(r2 == Map(1L -> 1L, 2L -> 2L))
    assert(r3 == r1)
  }

  test("disjoint cliques converge to one community per clique") {
    val k4a = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val k4b = for (i <- 5L to 8L; j <- (i + 1) to 8L) yield (i, j)
    val got = run(k4a ++ k4b, (1L to 8L).toSeq, rounds = 3)
    assert(got.filterKeys(_ <= 4).values.toSet.size == 1)
    assert(got.filterKeys(_ >= 5).values.toSet.size == 1)
    assert(got(1L) != got(5L))
  }

  test("isolated nodes keep their singleton community") {
    val got = run(Seq((1L, 2L)), Seq(1L, 2L, 9L), rounds = 3)
    assert(got(9L) == 9L)
  }

  test("the 3-round partition of a clustered graph beats singletons on modularity") {
    // two K5s joined by one bridge — asymmetric enough for sync moves
    // to settle into the two cliques
    val k5a = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val k5b = for (i <- 6L to 10L; j <- (i + 1) to 10L) yield (i, j)
    val edges = k5a ++ k5b :+ ((5L, 6L))
    val got = run(edges, (1L to 10L).toSeq, rounds = 3)
    assert(got.filterKeys(_ <= 5).values.toSet.size == 1)
    assert(got.filterKeys(_ >= 6).values.toSet.size == 1)
    assert(got(1L) != got(10L))
  }

  test("two-level: phase 2 merges a split clique back together") {
    // rounds1 = 1 leaves K4 split as {1}|{2,3,4} (the hand-traced sync
    // round); contraction gives super-nodes with self-weight 3 / 0 and
    // bridge weight 3, and the weighted phase-2 gain of merging is
    // 2·6·3 − 3·9 = +9 > 0 — the coarse round must reunite the clique
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = Louvain
      .louvainTwoLevel(k4.toDF("src", "dst"), (1L to 4L).toDF("id"),
        rounds1 = 1, rounds2 = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.values.toSet.size == 1, s"clique not reunited: $got")
  }

  test("two-level: separated cliques stay separated through the coarse rounds") {
    // two K5s + one bridge: phase 1 finds the cliques; the coarse gain
    // of merging across the bridge is 2·21·1 − 21·21 < 0 — modularity
    // says keep them apart, and phase 2 must agree
    val k5a = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val k5b = for (i <- 6L to 10L; j <- (i + 1) to 10L) yield (i, j)
    val edges = k5a ++ k5b :+ ((5L, 6L))
    val one = Louvain
      .louvainSync(edges.toDF("src", "dst"), (1L to 10L).toDF("id"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Louvain
      .louvainTwoLevel(edges.toDF("src", "dst"), (1L to 10L).toDF("id"),
        rounds1 = 3, rounds2 = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two.filterKeys(_ <= 5).values.toSet.size == 1)
    assert(two.filterKeys(_ >= 6).values.toSet.size == 1)
    assert(two(1L) != two(10L))
    // and the two-level partition refines phase 1's structure exactly
    assert(one.groupBy(_._2).values.map(_.keySet).toSet ==
      two.groupBy(_._2).values.map(_.keySet).toSet)
  }

  test("measured modularity: Q(two-level) >= Q(phase-1) on fixture graphs") {
    def totalQ(edges: Seq[(Long, Long)], ids: Seq[Long],
        comm: Map[Long, Long]): Double =
      graft.operators.GraphAudit
        .modularity(
          edges.toDF("src", "dst"), ids.toDF("id"),
          comm.toSeq.toDF("id", "community"))
        .agg(sum(col("q"))).head.getDouble(0)
    val k5a = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val k5b = for (i <- 6L to 10L; j <- (i + 1) to 10L) yield (i, j)
    val fixtures: Seq[(Seq[(Long, Long)], Seq[Long], Int)] = Seq(
      // split-K4: phase 2 reunites the clique, so Q strictly improves
      ((for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)), 1L to 4L, 1),
      // two bridged K5s: phase 2 keeps the partition, Q equal
      (k5a ++ k5b :+ ((5L, 6L)), 1L to 10L, 3),
      // ring + chords: a messier graph, ordering must still hold
      ((1L to 30L).flatMap(i => Seq((i, i % 30 + 1), (i, (i + 4) % 30 + 1))),
        1L to 30L, 2))
    fixtures.foreach { case (edges, idr, r1) =>
      val ids = idr.toSeq
      val e = edges.toDF("src", "dst")
      val p1 = Louvain.louvainSync(e, ids.toDF("id"), rounds = r1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val two = Louvain.louvainTwoLevel(e, ids.toDF("id"), rounds1 = r1, rounds2 = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val q1 = totalQ(edges, ids, p1)
      val q2 = totalQ(edges, ids, two)
      assert(q2 >= q1 - 1e-12,
        s"two-level worsened modularity: Q1=$q1 Q2=$q2 (rounds1=$r1)")
    }
  }

  test("result is partition-invariant and repeatable") {
    val edges = (1L to 30L).flatMap(i => Seq((i, i % 30 + 1), (i, (i + 4) % 30 + 1)))
    val a = run(edges, (1L to 30L).toSeq, rounds = 3)
    val b = Louvain
      .louvainSync(
        edges.toDF("src", "dst").repartition(7),
        (1L to 30L).toDF("id").repartition(3),
        rounds = 3)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(a == b)
  }
}
