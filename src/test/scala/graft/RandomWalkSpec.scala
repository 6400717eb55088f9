package graft

import org.apache.spark.sql.functions._

import graft.operators.RandomWalk

/** Gates for the random-walk corpus generators (DeepWalk / node2vec /
  * skip-gram pairs): structural validity (walks follow edges, full
  * length, one node per step), determinism (md5 coins, no RNG), the
  * node2vec bias semantics under extreme weights, and skip-gram pair
  * algebra on a handcrafted walk table.
  */
class RandomWalkSpec extends SparkSpec {
  import spark.implicits._

  private val n = 24

  /** Directed cycle 0→1→…→n−1→0 plus chords i→i+5: undirected degree 4. */
  private def cycleEdges = (0 until n).flatMap { i =>
    Seq((i.toLong, ((i + 1) % n).toLong), (i.toLong, ((i + 5) % n).toLong))
  }.toDF("src", "dst")

  private def starts = (0 until n by 3).map(_.toLong).toDF("vec_id")

  test("uniformWalks: full length, one node per step, every hop is an edge, deterministic") {
    val walks = RandomWalk.uniformWalks(cycleEdges, starts, steps = 6, salt = "t")
    val rows = walks.as[(Long, Int, Long)].collect()
    val byWalk = rows.groupBy(_._1)
    assert(byWalk.size == starts.count())
    val und = cycleEdges.as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    byWalk.foreach { case (wid, steps) =>
      assert(steps.map(_._2).sorted.toSeq == (0 to 6), s"walk $wid steps")
      assert(steps.find(_._2 == 0).get._3 == wid, s"walk $wid must start at its id")
      val path = steps.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(und.contains((a, b)), s"walk $wid hop $a->$b is not an edge")
      }
    }
    val again = RandomWalk.uniformWalks(cycleEdges, starts, steps = 6, salt = "t")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(again.toSeq == rows.sortBy(r => (r._1, r._2)).toSeq, "not deterministic")
    // a different salt must give a different trajectory somewhere
    val other = RandomWalk.uniformWalks(cycleEdges, starts, steps = 6, salt = "u")
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(other.toSeq != again.toSeq, "salt does not enter the coin")
  }

  test("node2vecWalks: structural validity + extreme wBack makes walks oscillate") {
    val walks = RandomWalk.node2vecWalks(
      cycleEdges, starts, steps = 5, wBack = 1, wAdj = 2, wFar = 4, salt = "t")
    val rows = walks.as[(Long, Int, Long)].collect()
    val und = cycleEdges.as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    rows.groupBy(_._1).foreach { case (wid, steps) =>
      assert(steps.map(_._2).sorted.toSeq == (0 to 5), s"walk $wid steps")
      steps.sortBy(_._2).map(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(und.contains((a, b)), s"walk $wid hop $a->$b is not an edge")
      }
    }
    // wBack ≫ everything: from step 2 on, nearly every pick returns to
    // prev — the walk oscillates between its first two nodes. The coin
    // lands outside the back slot only with prob ~(deg−1)·4/10^6.
    val osc = RandomWalk.node2vecWalks(
      cycleEdges, starts, steps = 5,
      wBack = 1000000, wAdj = 1, wFar = 1, salt = "t")
      .as[(Long, Int, Long)].collect()
    osc.groupBy(_._1).foreach { case (wid, steps) =>
      val path = steps.sortBy(_._2).map(_._3)
      (2 until path.length).foreach { t =>
        assert(path(t) == path(t - 2),
          s"walk $wid step $t: ${path.mkString("->")} does not oscillate")
      }
    }
  }

  test("weightedWalks: structural validity + near-zero-distance neighbor dominates") {
    // star around 0: node 1 at dist ~0 (w ~ 10^6), nodes 2..9 at dist 9
    // (w = 10^5) -> from 0, node 1 wins with prob ~ 0.56; to make the
    // bias a hard gate, use dist 999999 for the far nodes (w = 1): the
    // coin lands outside node 1's slot with prob ~ 8/10^6
    val edges = ((2L to 9L).map(l => (0L, l, 999999.0)) :+ (0L, 1L, 0.0))
      .toDF("src", "dst", "dist")
    // every walk starts at 0... but starts must be distinct walk ids;
    // use many salts instead: 64 single-step walks from node 0
    val starts = Seq(0L).toDF("vec_id")
    val picks = (1 to 64).map { i =>
      graft.operators.RandomWalk
        .weightedWalks(edges, starts, steps = 1, salt = s"t$i")
        .filter(col("step") === 1).select(col("id")).as[Long].head()
    }
    assert(picks.forall(_ == 1L),
      s"heavy-weight neighbor must dominate: ${picks.distinct.toList}")
    // validity on the cycle fixture: full length, hops are edges
    val cyc = cycleEdges.withColumn("dist", lit(1.0))
    val walks = graft.operators.RandomWalk
      .weightedWalks(cyc, (0 until n by 3).map(_.toLong).toDF("vec_id"),
        steps = 4, salt = "t")
      .as[(Long, Int, Long)].collect()
    val und = cyc.select(col("src"), col("dst")).as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    walks.groupBy(_._1).foreach { case (wid, steps) =>
      assert(steps.map(_._2).sorted.toSeq == (0 to 4), s"walk $wid steps")
      steps.sortBy(_._2).map(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(und.contains((a, b)), s"walk $wid hop $a->$b is not an edge")
      }
    }
    // equal weights == uniform-walk distribution shape: same adjacency,
    // same coin salt, but a DIFFERENT coin stream ("wwk" vs "wk") -- so
    // just gate determinism here
    val again = graft.operators.RandomWalk
      .weightedWalks(cyc, (0 until n by 3).map(_.toLong).toDF("vec_id"),
        steps = 4, salt = "t")
      .as[(Long, Int, Long)].collect()
    assert(again.sorted.toSeq == walks.sorted.toSeq)
  }

  test("walk prefixes nest: an 8-step walk table restricted to step<=5 IS the 5-step table") {
    val w5 = RandomWalk.uniformWalks(cycleEdges, starts, steps = 5, salt = "t")
      .as[(Long, Int, Long)].collect().sorted
    val w8 = RandomWalk.uniformWalks(cycleEdges, starts, steps = 8, salt = "t")
      .as[(Long, Int, Long)].collect().filter(_._2 <= 5).sorted
    assert(w8.toSeq == w5.toSeq,
      "the coin keys on (walk, step) only - prefixes must nest exactly")
  }

  test("skipGramPairs: exact positives on a handcrafted walk; negative count/label/universe") {
    // one walk 10→11→12→13 (steps 0..3)
    val wt = Seq(
      (10L, 0, 10L), (10L, 1, 11L), (10L, 2, 12L), (10L, 3, 13L)
    ).toDF("walk_id", "step", "id")
    val ids = (0L until 50L).toDF("vec_id")
    val pos = RandomWalk.skipGramPairs(wt, window = 1, negatives = 0, ids, "t")
      .select(col("center"), col("context")).as[(Long, Long)].collect().toSet
    assert(pos == Set(
      (10L, 11L), (11L, 10L), (11L, 12L), (12L, 11L), (12L, 13L), (13L, 12L)))
    val all = RandomWalk.skipGramPairs(wt, window = 1, negatives = 3, ids, "t")
    val negs = all.filter(col("label") === 0)
      .select(col("center"), col("context"), col("off"))
      .as[(Long, Long, Long)].collect()
    assert(negs.length == 4 * 3, "3 negatives per walk position")
    assert(negs.forall { case (_, c, _) => c >= 0 && c < 50 },
      "negatives must come from the id universe")
    assert(negs.forall(_._3 < 0), "negative rows carry off = -j")
    val again = RandomWalk.skipGramPairs(wt, window = 1, negatives = 3, ids, "t")
      .filter(col("label") === 0)
      .select(col("center"), col("context"), col("off"))
      .as[(Long, Long, Long)].collect()
    assert(again.sorted.toSeq == negs.sorted.toSeq, "negatives not deterministic")
  }
}
