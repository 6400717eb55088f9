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
