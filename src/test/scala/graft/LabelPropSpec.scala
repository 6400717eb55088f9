package graft

import org.apache.spark.sql.functions._

import graft.operators.LabelProp

/** Invariants for synchronous clamped label propagation. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      edges: Seq[(Long, Long)],
      seeds: Seq[(Long, Long)],
      ids: Seq[Long],
      rounds: Int
  ): Map[Long, (Option[Long], String)] =
    LabelProp
      .labelPropagation(
        edges.toDF("src", "dst"), seeds.toDF("id", "lab"),
        ids.toDF("id"), rounds)
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getString(2)))
      .toMap

  test("duplicate/conflicting seed rows dedupe to min label — no vote or row fan-out") {
    val edges = Seq((1L, 2L), (1L, 3L))
    val ids = Seq(1L, 2L, 3L)
    // id 1 seeded three times with conflicting labels: deterministic
    // dedup keeps min(5,7)=5, emits ONE row per node, ONE vote per edge
    val dup = run(edges, Seq((1L, 7L), (1L, 5L), (1L, 5L)), ids, rounds = 1)
    val clean = run(edges, Seq((1L, 5L)), ids, rounds = 1)
    assert(dup == clean, s"duplicate seeds diverged: $dup vs $clean")
    assert(dup(1L) == (Some(5L), "seed"))
    assert(dup(2L) == (Some(5L), "propagated"))
    // the Map above masks duplicates — assert the row count directly
    val rows = LabelProp.labelPropagation(
      edges.toDF("src", "dst"),
      Seq((1L, 7L), (1L, 5L), (1L, 5L)).toDF("id", "lab"),
      ids.toDF("id"), rounds = 1).count()
    assert(rows == 3L, s"seed fan-out produced $rows rows for 3 nodes")
  }

  test("labels walk one hop per round along a path; isolated stays unlabeled") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val ids = Seq(1L, 2L, 3L, 4L, 9L)
    val after1 = run(edges, Seq((1L, 7L)), ids, rounds = 1)
    assert(after1(2L) == (Some(7L), "propagated"))
    assert(after1(3L) == (None, "unlabeled"))
    val after3 = run(edges, Seq((1L, 7L)), ids, rounds = 3)
    assert(after3(1L) == (Some(7L), "seed"))
    assert(after3(2L) == (Some(7L), "propagated"))
    assert(after3(3L) == (Some(7L), "propagated"))
    assert(after3(4L) == (Some(7L), "propagated"))
    assert(after3(9L) == (None, "unlabeled"))
  }

  test("majority wins; exact ties adopt the smaller label; seeds stay clamped") {
    // node 10 sees labels {5, 5, 8} -> majority 5; node 20 sees {5, 8}
    // tied -> min label 5; seed 3 (label 8) keeps 8 despite neighbors 5
    val edges = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (1L, 20L), (3L, 20L),
      (1L, 3L))
    val seeds = Seq((1L, 5L), (2L, 5L), (3L, 8L))
    val got = run(edges, seeds, Seq(1L, 2L, 3L, 10L, 20L), rounds = 1)
    assert(got(10L) == (Some(5L), "propagated"))
    assert(got(20L) == (Some(5L), "propagated"))
    assert(got(3L) == (Some(8L), "seed"))
  }

  test("propagated labels are clamped in later rounds (no flip-flop)") {
    // 30 gets label 5 in round 1 from seed 1; in round 2 its neighborhood
    // majority would be 8 (two 8-seeds join the vote) — but it is clamped
    val edges = Seq((1L, 30L), (2L, 30L), (3L, 30L), (30L, 40L))
    val seeds = Seq((1L, 5L), (2L, 8L), (3L, 8L))
    val r1 = run(edges, seeds, Seq(1L, 2L, 3L, 30L, 40L), rounds = 1)
    assert(r1(30L)._1 == Some(8L)) // round 1 majority is already 8 (2 vs 1)
    val r2 = run(edges, Seq((1L, 5L)), Seq(1L, 2L, 3L, 30L, 40L), rounds = 2)
    assert(r2(30L)._1 == Some(5L), "round-1 label must persist")
    assert(r2(40L)._1 == Some(5L), "and keep propagating outward")
  }
}
