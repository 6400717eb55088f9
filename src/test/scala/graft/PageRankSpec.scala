package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Invariants for the power-iteration PageRank. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("cycle graph: perfect symmetry keeps every rank at exactly 1/N") {
    val n = 6
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val ids = (0L until n.toLong).toDF("id")
    val pr = PageRank.pageRank(edges, ids, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.values.foreach(v =>
      assert(math.abs(v - 1.0 / n) < 1e-15, s"cycle rank $v != 1/$n"))
  }

  test("star graph: the hub outranks every leaf; mass conserved when nothing dangles") {
    val edges = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    val ids = (0L to 8L).toDF("id")
    val pr = PageRank.pageRank(edges, ids, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hub = pr(0L)
    (1L to 8L).foreach(i => assert(hub > pr(i), s"leaf $i >= hub"))
    // undirected star with no isolated nodes: total mass stays ~1
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass ${pr.values.sum}")
  }

  test("personalized PageRank: mass concentrates near the seed; far nodes get zero") {
    // path 1-2-3-4-5, seed {1}: rank decays with distance; node 5 is 4
    // hops out and unreachable in 3 rounds; disconnected 9 stays 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val pr = PageRank.personalizedPageRank(edges, ids, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // mass reaches exactly the 3-hop ball (no monotone decay claim —
    // synchronous iteration oscillates on a path before convergence)
    for (i <- Seq(1L, 2L, 3L, 4L)) assert(pr(i) > 0.0, s"unreached $i: $pr")
    assert(pr(5L) == 0.0 && pr(9L) == 0.0, s"out-of-ball nodes must be 0: $pr")
    // the seed keeps at least its teleport share
    assert(pr(1L) >= (1.0 - 0.85), s"seed lost its teleport floor: $pr")
    // global and personalized agree when the seed set IS the universe
    val glob = PageRank.pageRank(edges, ids, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pAll = PageRank.personalizedPageRank(edges, ids, ids, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(glob == pAll, "seeds == universe must reduce to global PageRank")
  }

  test("dangling mass redistributes along the teleport vector; total mass = 1") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val ids = Seq(1L, 2L, 9L).toDF("id")
    val pr = PageRank.pageRank(edges, ids, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the isolated node keeps MORE than the bare teleport floor: it also
    // receives its uniform share of its own redistributed dangling mass
    assert(pr(9L) > (1.0 - 0.85) / 3, s"isolated ${pr(9L)}")
    assert(pr(1L) == pr(2L) && pr(1L) > pr(9L))
    // textbook conservation: redistribution keeps Σpr = 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-12, s"mass ${pr.values.sum}")
  }

  test("personalized dangling mass lands only on seeds; seed-set mass = 1") {
    // node 9 is isolated; its mass must flow back to the seed, never to
    // other non-seed nodes' teleport (they have tp = 0)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val ids = Seq(1L, 2L, 9L).toDF("id")
    val pr = PageRank.personalizedPageRank(
      edges, ids, Seq(1L).toDF("id"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(9L) == 0.0, s"non-seed isolated node gained mass: $pr")
    assert(math.abs(pr.values.sum - 1.0) < 1e-12, s"mass ${pr.values.sum}")
  }

  test("no-dangling graphs are bit-identical to the plain power iteration") {
    // cycle: closed under out-edges, Dm = 0.0 every round — redistribution
    // must be float-invisible (s + 0.0·tp == s), which is what keeps the
    // pipeline_pagerank / pipeline_ppr oracles valid verbatim
    val n = 5
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val ids = (0L until n.toLong).toDF("id")
    val pr = PageRank.pageRank(edges, ids, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.values.foreach(v =>
      assert(math.abs(v - 1.0 / n) < 1e-15, s"cycle rank $v"))
  }
}
