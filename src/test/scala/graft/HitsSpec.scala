package graft

import org.apache.spark.sql.functions._

import graft.operators.Hits

/** Invariants for HITS hubs/authorities. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("directed star: the target holds ALL authority, sources all hub mass") {
    val edges = (1L to 8L).map(i => (i, 0L)).toDF("src", "dst")
    val ids = (0L to 8L).toDF("id")
    val got = Hits.hits(edges, ids, rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(0L)._1 == 1.0, s"center authority ${got(0L)}")
    assert(got(0L)._2 == 0.0, s"center has no out-edges, hub must be 0")
    (1L to 8L).foreach { i =>
      assert(got(i)._1 == 0.0, s"leaf $i authority ${got(i)}")
      assert(math.abs(got(i)._2 - 1.0 / math.sqrt(8)) < 1e-12, s"leaf hub ${got(i)}")
    }
  }

  test("L2 norms are 1; isolated nodes score 0; partition-invariant") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val ids = (1L to 5L).toDF("id") // 4, 5 isolated
    val got = Hits.hits(edges, ids, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val a2 = got.map(t => t._2 * t._2).sum
    val h2 = got.map(t => t._3 * t._3).sum
    assert(math.abs(a2 - 1.0) < 1e-9, s"authority norm $a2")
    assert(math.abs(h2 - 1.0) < 1e-9, s"hub norm $h2")
    got.filter(t => t._1 >= 4).foreach { t =>
      assert(t._2 == 0.0 && t._3 == 0.0, s"isolated scored: $t")
    }
    val rep = Hits.hits(edges.repartition(7), ids.repartition(3), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rep.toSeq == got.sortBy(_._1).toSeq, "partitioning changed scores")
  }

  test("regular symmetric graph: the uniform vector is a fixed point of both scores") {
    // directed 2-regular cycle both ways: every node has in = out = 2,
    // so uniform h stays uniform through every a/h update — both scores
    // sit at exactly 1/sqrt(n) after any number of rounds
    val n = 6
    val fwd = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val ids = (0L until n.toLong).toDF("id")
    val want = 1.0 / math.sqrt(n)
    Hits.hits(edges, ids, rounds = 3)
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(1) - want) < 1e-12, s"authority: $r")
        assert(math.abs(r.getDouble(2) - want) < 1e-12, s"hub: $r")
      }
  }
}
