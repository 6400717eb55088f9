package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{IvfIndex, ScalarQuantizer}
import graft.queries.Q

/** IVF build/search invariants beyond the ivf_knn oracle: the
  * partition-pruned disk path answers exactly like the in-memory path,
  * and the probe stage carries the query vector without a second scan.
  */
class IvfSpec extends SparkSpec {

  private lazy val emb = Q.t(spark, sf0001, "embeddings")
    .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
  private lazy val cents = emb
    .filter(col("vec_id") < 8).orderBy(col("vec_id"))
    .select(col("vec"))
    .collect().map(_.getSeq[Double](0).toArray)
  private lazy val queries = emb
    .filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("query_id"), col("vec").as("qv"))

  test("searchPartitioned == in-memory search (same cells, same top-k)") {
    val path = java.nio.file.Files.createTempDirectory("ivfspec").toString + "/idx"
    IvfIndex.build(spark, emb, "vec_id", "vec", cents, path)
    val mem = IvfIndex.search(
      spark, IvfIndex.assign(spark, emb, "vec_id", "vec", cents),
      queries, "query_id", "qv", cents, k = 5, nprobe = 3)
    val disk = IvfIndex.searchPartitioned(
      spark, path, queries, "query_id", "qv", cents, k = 5, nprobe = 3)
    assert(mem.except(disk).count() == 0 && disk.except(mem).count() == 0)
  }

  test("rangeSearchPartitioned == brute force at every radius; pruning bites") {
    val path = java.nio.file.Files.createTempDirectory("ivfrange").toString + "/idx"
    IvfIndex.build(spark, emb, "vec_id", "vec", cents, path)
    val base = emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv"))
    for (r2 <- Seq(0.6, 1.25, 3.0)) {
      val pruned = IvfIndex.rangeSearchPartitioned(
        spark, path, queries, "query_id", "qv", cents, r2)
        .select(col("query_id"), col("neighbor_id"))
      val brute = queries.crossJoin(base)
        .filter(graft.functions.VectorExpressions
          .l2SqFast(col("qv"), col("bv")) <= r2)
        .select(col("query_id"), col("neighbor_id"))
      assert(pruned.except(brute).count() == 0 &&
        brute.except(pruned).count() == 0, s"radius2=$r2 diverged")
    }
    // pruning needs clustered geometry (near-random high-dim data has
    // every cell's covering ball overlapping every query — nothing is
    // provably empty, and the spec above only demands exactness there).
    // On tight clusters around separated centroids, a radius smaller
    // than the centroid gaps must drop most (query, cell) pairs.
    import spark.implicits._
    val cluster = (0 until 4).flatMap { c =>
      (0 until 25).map { j =>
        val v = Array.fill(8)(c * 10.0)
        v(j % 8) += 0.01 * (j + 1) // jitter within 0.25 of the center
        ((c * 25 + j).toLong, v.toSeq)
      }
    }.toDF("vec_id", "vec")
    val cCents = (0 until 4)
      .map(c => Array.fill(8)(c * 10.0)).toArray
    val cPath = java.nio.file.Files.createTempDirectory("ivfrangec").toString + "/idx"
    IvfIndex.build(spark, cluster, "vec_id", "vec", cCents, cPath)
    val cq = cluster.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val radii = IvfIndex.cellRadii(spark, cPath, cCents)
    val nProbePairs = IvfIndex
      .rangeProbeCells(cq, "query_id", "qv", radii, 1.0).count()
    val nQ = cq.count()
    // each query's own cluster only: exactly one admissible cell
    assert(nProbePairs == nQ, s"expected $nQ probe pairs, got $nProbePairs")
    // and the pruned search still equals brute force on this geometry
    val cBase = cluster.select(col("vec_id").as("neighbor_id"), col("vec").as("bv"))
    val prunedC = IvfIndex.rangeSearchPartitioned(
      spark, cPath, cq, "query_id", "qv", cCents, 1.0)
      .select(col("query_id"), col("neighbor_id"))
    val bruteC = cq.crossJoin(cBase)
      .filter(graft.functions.VectorExpressions
        .l2SqFast(col("qv"), col("bv")) <= 1.0)
      .select(col("query_id"), col("neighbor_id"))
    assert(prunedC.except(bruteC).count() == 0 &&
      bruteC.except(prunedC).count() == 0)
  }

  test("ivf_sq: nprobe = nCells equals flat SQ brute force (routing loses nothing)") {
    val model = ScalarQuantizer.train(emb, "vec")
    val codes = ScalarQuantizer.encodePartitioned(emb, "vec_id", "vec", model)
    val fast = graft.functions.VectorExpressions
    val index = IvfIndex
      .assign(spark, emb, "vec_id", "vec", cents)
      .select(col("id"), col("cell"))
      .join(codes, col("id") === col("vec_id"))
      .select(col("cell"), col("id").as("neighbor_id"),
        ScalarQuantizer.decodeCol(model, col("code")).as("dv"))
    def topk(cand: org.apache.spark.sql.DataFrame) = cand
      .withColumn("dist", fast.l2SqFast(col("qv"), col("dv")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("dist"), col("neighbor_id"), 5).as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("neighbor_id"))
    val probed = topk(
      IvfIndex.probeCells(spark, queries, "query_id", "qv", cents, cents.length)
        .join(index, "cell"))
    val flat = topk(index.drop("cell").crossJoin(broadcast(queries)))
    assert(probed.except(flat).count() == 0 && flat.except(probed).count() == 0)
  }

  test("probeCells: nprobe rows per query, qvec carried through") {
    val probes = IvfIndex.probeCells(spark, queries, "query_id", "qv", cents, 2)
    val n = queries.count()
    assert(probes.count() == n * 2)
    // every row still holds the query vector (no re-join needed downstream)
    assert(probes.filter(col("qv").isNull).count() == 0)
    // cells are valid centroid indices
    assert(probes.filter(col("cell") < 0 || col("cell") >= cents.length).count() == 0)
  }

  test("probeCellsAnn at exhaustive ef == exact probeCells; end-to-end equal") {
    import graft.operators.HnswParams
    // efSearch >= nCells makes the centroid-graph traversal exhaustive,
    // so the ANN probe set must equal the exact crossJoin one (both
    // tie-break equal distances by ascending cell id)
    val ann = IvfIndex.probeCellsAnn(
      spark, queries, "query_id", "qv", cents, nprobe = 2,
      HnswParams(m = 4, efConstruction = 16, efSearch = cents.length))
    val exact = IvfIndex.probeCells(spark, queries, "query_id", "qv", cents, 2)
    val a = ann.select(col("query_id"), col("cell"))
    val e = exact.select(col("query_id"), col("cell"))
    assert(a.except(e).count() == 0 && e.except(a).count() == 0)
    // the ANN probe table drives the partition-pruned search identically
    val path = java.nio.file.Files.createTempDirectory("ivfann").toString + "/idx"
    IvfIndex.build(spark, emb, "vec_id", "vec", cents, path)
    val viaAnn = IvfIndex.searchPartitionedWith(
      spark, path, ann, "query_id", "qv", k = 5)
    val viaExact = IvfIndex.searchPartitioned(
      spark, path, queries, "query_id", "qv", cents, k = 5, nprobe = 2)
    assert(viaAnn.except(viaExact).count() == 0
      && viaExact.except(viaAnn).count() == 0)
  }

  test("searchPartitioned scans the query batch exactly once (single probe evaluation)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ivfspec1p").toString + "/idx"
    IvfIndex.build(spark, emb, "vec_id", "vec", cents, path)
    // instrument the query source: the accumulator counts partition scans,
    // so with one partition it counts full evaluations of the probe
    // subtree's input. Before the localCheckpoint fix this read 2 (filter
    // collect + candidate join); the contract is exactly 1.
    val acc = spark.sparkContext.longAccumulator("ivf-query-batch-scans")
    val counted = queries
      .repartition(1)
      .as[(Long, Seq[Double])]
      .mapPartitions { it => acc.add(1); it }
      .toDF("query_id", "qv")
    val res = IvfIndex.searchPartitioned(
      spark, path, counted, "query_id", "qv", cents, k = 5, nprobe = 3)
    assert(res.count() > 0)
    assert(acc.value == 1L, s"query batch evaluated ${acc.value} times")
  }

  test("upsert/delete: maintained index answers exactly like the live corpus") {
    val path = java.nio.file.Files.createTempDirectory("ivfmaint").toString + "/idx"
    // build on 4/5 of the corpus, upsert the rest, delete every 7th id
    IvfIndex.build(
      spark, emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "vec", cents, path)
    IvfIndex.upsert(
      spark, path, emb.filter(col("vec_id") % 5 === 0), "vec_id", "vec", cents)
    IvfIndex.delete(
      spark, path, emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")))
    val live = emb.filter(col("vec_id") % 7 =!= 0)
    val expected = IvfIndex.search(
      spark, IvfIndex.assign(spark, live, "vec_id", "vec", cents),
      queries, "query_id", "qv", cents, k = 5, nprobe = 3)
    val maintained = IvfIndex.searchPartitioned(
      spark, path, queries, "query_id", "qv", cents, k = 5, nprobe = 3)
    assert(maintained.except(expected).count() == 0
      && expected.except(maintained).count() == 0)
    // loadLive exposes exactly one surviving version per live id
    val ids = IvfIndex.loadLive(spark, path).groupBy(col("id")).count()
    assert(ids.filter(col("count") =!= 1).count() == 0)
    assert(ids.count() == live.count())

    // time travel: the view as of each generation of the history —
    // gen 0 = the base build, gen 1 = after the upsert (every id live,
    // deletes not yet visible), current = post-delete
    val asOf0 = IvfIndex.loadLive(spark, path, asOfGen = 0L)
    assert(asOf0.count() == emb.filter(col("vec_id") % 5 =!= 0).count())
    assert(asOf0.filter(col("gen") =!= 0).count() == 0)
    val asOf1 = IvfIndex.loadLive(spark, path, asOfGen = 1L)
    assert(asOf1.count() == emb.count())
    assert(asOf1.groupBy(col("id")).count()
      .filter(col("count") =!= 1).count() == 0)

    // compaction: results invariant, log gone, gens reset to 0
    IvfIndex.compact(spark, path)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".log")))
    val compacted = IvfIndex.searchPartitioned(
      spark, path, queries, "query_id", "qv", cents, k = 5, nprobe = 3)
    assert(compacted.except(expected).count() == 0
      && expected.except(compacted).count() == 0)
    assert(IvfIndex.load(spark, path).filter(col("gen") =!= 0).count() == 0)
  }

  test("splitCell: hot cell rebalanced, corpus intact, exhaustive search unchanged") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ivfsplit").toString + "/idx"
    IvfIndex.build(spark, emb, "vec_id", "vec", cents, path)
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cvec")
    // hottest cell + two of its own members as deterministic sub-centroids
    val occ = IvfIndex.load(spark, path)
      .groupBy(col("cell")).count().orderBy(col("count").desc, col("cell"))
      .head()
    val hot = occ.getInt(0)
    val hotN = occ.getLong(1)
    val subs = IvfIndex.load(spark, path).filter(col("cell") === hot)
      .orderBy(col("id")).limit(2)
      .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
    val newCents = IvfIndex.splitCell(
      spark, path, centsDf, hot, subs, startCell = cents.length)
    // corpus intact: every row still present exactly once; old dir gone;
    // the two new cells hold exactly the split cell's rows
    val after = IvfIndex.load(spark, path)
    assert(after.count() == emb.count())
    assert(after.groupBy(col("id")).count().filter(col("count") =!= 1).count() == 0)
    assert(after.filter(col("cell") === hot).count() == 0)
    assert(after.filter(col("cell") >= cents.length).count() == hotN)
    // exhaustive probe over the UPDATED centroid table == exact search
    val nCells = newCents.count().toInt
    val res = IvfIndex.searchPartitionedWith(
      spark, path,
      IvfIndex.probeCellsTable(queries, "query_id", "qv", newCents, nCells),
      "query_id", "qv", k = 5)
    val exact = graft.operators.BruteForceKNN.knn(
      queries,
      emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 5)
    assert(res.select(col("query_id"), col("neighbor_id"))
      .except(exact.select(col("query_id"), col("neighbor_id"))).count() == 0)
  }

  test("exactSearchPartitioned == brute force (low nprobe, random data)") {
    // near-random 64-d data is the WORST case for the triangle-inequality
    // prune (cell balls overlap everything) — exactness must hold anyway,
    // with the query degrading to a verified full scan.
    val path = java.nio.file.Files.createTempDirectory("ivfexact").toString + "/idx"
    IvfIndex.build(spark, emb, "vec_id", "vec", cents, path)
    val got = IvfIndex.exactSearchPartitioned(
      spark, path, queries, "query_id", "qv", cents, k = 5, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    val exact = graft.operators.BruteForceKNN.knn(
      queries,
      emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 5)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    assert(got.except(exact).count() == 0 && exact.except(got).count() == 0)
  }

  test("exactSearchPartitioned prunes cells on clustered geometry") {
    // tight clusters around separated centroids: the phase-1 bound from
    // probing the query's own cluster rules out every other cell, so the
    // admissible probe count must collapse to ~1 cell/query while the
    // answer stays bit-identical to brute force.
    import spark.implicits._
    val cluster = (0 until 4).flatMap { c =>
      (0 until 25).map { j =>
        val v = Array.fill(8)(c * 10.0)
        v(j % 8) += 0.01 * (j + 1)
        (c * 25L + j, v.toSeq)
      }
    }.toDF("vec_id", "vec")
    val cc = (0 until 4).map(c => Array.fill(8)(c * 10.0)).toArray
    val path = java.nio.file.Files.createTempDirectory("ivfexactc").toString + "/idx"
    IvfIndex.build(spark, cluster, "vec_id", "vec", cc, path)
    val q = cluster.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val got = IvfIndex.exactSearchPartitioned(
      spark, path, q, "query_id", "qv", cc, k = 3, nprobe = 1)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    val exact = graft.operators.BruteForceKNN.knn(
      q, cluster.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    assert(got.except(exact).count() == 0 && exact.except(got).count() == 0)
    // the admissible set itself: kth-dist bound + triangle inequality
    // leaves exactly the home cell for every query (clusters are 10·√8
    // apart; rmax ≈ 0.25, in-cluster kth-dist ≪ 1).
    val ub = IvfIndex.searchPartitioned(
      spark, path, q, "query_id", "qv", cc, k = 3, nprobe = 1)
      .groupBy(col("query_id")).agg(max(sqrt(col("dist"))).as("rub"))
    val admissible = q.join(ub, "query_id")
      .crossJoin(broadcast(IvfIndex.cellRadii(spark, path, cc)))
      .filter(sqrt(graft.functions.VectorExpressions.l2SqFast(col("qv"), col("cvec")))
        <= col("rub") + col("rmax") + lit(1e-9))
    assert(admissible.count() == q.count(), "expected exactly 1 admissible cell/query")
  }

  test("nprobe = nCells degrades to exact search over all cells") {
    val all = IvfIndex.search(
      spark, IvfIndex.assign(spark, emb, "vec_id", "vec", cents),
      queries, "query_id", "qv", cents, k = 5, nprobe = cents.length)
    val exact = graft.operators.BruteForceKNN.knn(
      queries,
      emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")),
      5
    ).select(col("query_id"), col("neighbor_id"))
    assert(all.select(col("query_id"), col("neighbor_id"))
      .except(exact).count() == 0)
  }
}
