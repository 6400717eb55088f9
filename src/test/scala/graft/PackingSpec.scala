package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing
import graft.queries.Q

/** Sequence-shaping invariants: chunk boundary arithmetic and the
  * distributed-prefix-sum packing offsets (must equal the sequential
  * definition regardless of partition layout).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: hand-computed fixture incl. partial tail and short doc") {
    val fix = Seq(
      (1L, "a b c d e f g"), // n=7: starts 0,3,6 at stride 3
      (2L, "x")              // n=1: one chunk of 1
    ).toDF("doc_id", "text")
    val r = Packing.chunk(fix, "doc_id", "text", chunkSize = 4, stride = 3)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))
      .toSet
    assert(r == Set(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 1L, "g"),
      (2L, 0L, 0L, 1L, "x")
    ))
  }

  test("chunk: every token covered, chunk sizes bounded") {
    val docs = Q.t(spark, sf0001, "documents")
    val r = Packing.chunk(docs, "doc_id", "text", chunkSize = 32, stride = 16)
    assert(r.filter(col("n_chunk_tokens") > 32 || col("n_chunk_tokens") < 1).count() == 0)
    // stride-16 windows of size 32: all but each doc's last chunk are full
    // ... and token coverage: sum over stride-aligned FIRST halves == n
    val n = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val covered = r
      .select(least(col("n_chunk_tokens"), lit(16L)).as("c"))
      .agg(sum(col("c"))).head.getLong(0)
    assert(covered == n, s"$covered != $n")
  }

  test("packOffsets equals the sequential definition on any partition layout") {
    val docs = Q.t(spark, sf0001, "documents")
    val expected = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, n)) => (id, n, acc + n) }
      .drop(1)
      .map { case (id, n, cumIncl) => id -> ((n, cumIncl - n, (cumIncl - n) / 512)) }
      .toMap
    for (parts <- Seq(1, 7, 32)) {
      val r = Packing
        .packOffsets(docs.repartition(parts), "doc_id", "text", ctx = 512)
        .collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
        .toMap
      assert(r == expected, s"mismatch at input partitions = $parts")
    }
  }

  test("distributedRank == global window rank, at any input partitioning") {
    import org.apache.spark.sql.expressions.Window
    val counts = Q.t(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val want = counts
      .withColumn(
        "token_id",
        (row_number().over(Window.orderBy(col("cnt").desc, col("token"))) - 1)
          .cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = Packing
        .distributedRank(
          counts.repartition(parts),
          Seq(col("cnt").desc, col("token")),
          "token_id")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got == want, s"mismatch at input partitions = $parts")
    }
  }

  test("packOffsets: offsets are dense — each doc starts where the previous ended") {
    val docs = Q.t(spark, sf0001, "documents")
    val rows = Packing.packOffsets(docs, "doc_id", "text", ctx = 512)
      .orderBy(col("doc_id")).collect()
    var expect = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == expect, s"doc ${r.getLong(0)}")
      expect += r.getLong(1)
    }
  }

  test("pipeline_shuffle: valid balanced permutation per epoch, epochs differ") {
    val world = 8
    val rows = graft.SparkEntry.queries("pipeline_shuffle")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Q.t(spark, sf0001, "documents").count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.foreach { case (ep, rs) =>
      // every doc exactly once, (rank, step) reconstructs a bijection onto
      // 0..N-1 — i.e. a true permutation, DistributedSampler-style
      assert(rs.map(_._2).distinct.length == nDocs, s"epoch $ep doc set")
      val ps = rs.map(t => t._3 + t._4 * world)
      assert(ps.distinct.length == nDocs && ps.min == 0L && ps.max == nDocs - 1,
        s"epoch $ep positions")
      // round-robin striping keeps shards balanced within one element
      val sizes = rs.groupBy(_._3).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"epoch $ep shard sizes $sizes")
    }
    // the reshuffle is real: epochs place docs differently
    val pos0 = byEpoch(0L).map(t => t._2 -> (t._3, t._4)).toMap
    val pos1 = byEpoch(1L).map(t => t._2 -> (t._3, t._4)).toMap
    assert(pos0.exists { case (d, p) => pos1(d) != p })
  }

  test("binPack: hand-computed NFD walk, capacity, oversize own-bin, determinism") {
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val fix = Seq(
      (1L, "a", doc(600)), // oversize -> its own bin 0
      (2L, "a", doc(300)),
      (3L, "a", doc(300)),
      (4L, "a", doc(200)),
      (5L, "a", doc(100)),
      (6L, "b", doc(512)), // exact fit -> bin 0 of group b
      (7L, "b", null: String) // null text packs as zero tokens
    ).toDF("doc_id", "lang", "text")
    val got = Packing.binPack(fix, "lang", "doc_id", "text", ctx = 512)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // walk of group a, sorted (tokens desc, id): 600 -> b0(600);
    // 300 -> b1(300); 300 -> 600>512 -> b2(300); 200 -> b2(500);
    // 100 -> 600>512 -> b3(100)
    assert(got == Set(
      ("a", 1L, 600L, 0L, 600L),
      ("a", 2L, 300L, 1L, 300L),
      ("a", 3L, 300L, 2L, 300L),
      ("a", 4L, 200L, 2L, 500L),
      ("a", 5L, 100L, 3L, 100L),
      ("b", 6L, 512L, 0L, 512L),
      ("b", 7L, 0L, 0L, 512L)), got)
    // capacity holds except for single-doc oversize bins
    val over = got.filter(_._5 > 512)
    assert(over.forall { case (_, _, n, _, fill) => fill == n })
    // partition-layout independence
    val again = Packing
      .binPack(fix.repartition(5), "lang", "doc_id", "text", ctx = 512)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(again == got)
  }

  test("binPack subShards: stratum splits deterministically, capacity still holds") {
    val docs = Q.t(spark, sf0001, "documents")
    val sharded = Packing.binPack(docs, "lang", "doc_id", "text", ctx = 512, subShards = 4)
    val plain = Packing.binPack(docs, "lang", "doc_id", "text", ctx = 512)
    // same doc multiset, every doc exactly once
    assert(sharded.count() == plain.count())
    assert(sharded.select(col("doc_id")).distinct().count() == docs.count())
    // salted groups are <lang>#<shard> and more numerous
    val gPlain = plain.select(col("group")).distinct().count()
    val gSharded = sharded.select(col("group")).distinct().count()
    assert(gSharded > gPlain && gSharded <= gPlain * 4)
    assert(sharded.filter(!col("group").contains("#")).count() == 0)
    // capacity invariant survives the split (oversize docs excepted)
    assert(sharded.filter(col("fill") > 512 && col("fill") =!= col("n_tokens"))
      .count() == 0)
    // token mass per language is preserved across the salting
    val massOf = (df: org.apache.spark.sql.DataFrame) => df
      .withColumn("lang", split(col("group"), "#").getItem(0))
      .groupBy(col("lang")).agg(sum(col("n_tokens")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(massOf(sharded) == massOf(plain))
  }
}
