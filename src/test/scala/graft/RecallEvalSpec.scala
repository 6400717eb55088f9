package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{BruteForceKNN, DistributedHnsw, HnswParams, RecallEval}
import graft.queries.Q
import graft.sources.{Fvecs, Ivecs}

/** The reference notebook's full evaluation loop (py/hnsw.ipynb cell-1/6)
  * on the engine's own sources and operators: base/query vectors through
  * fvecs, ground truth through ivecs, search distributed, recall scored
  * by the join-based evaluator.
  */
class RecallEvalSpec extends SparkSpec {
  import spark.implicits._

  test("fvecs -> search -> ivecs ground truth -> recall@k, end to end") {
    val dir = Files.createTempDirectory("recalleval").toString
    val emb = Q.t(spark, sf0001, "embeddings")
      .limit(200)
      .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
    // stage base vectors through the fvecs source (float round-trip)
    Fvecs.write(
      emb.select(col("vec_id"), col("vec").cast("array<float>")),
      "vec_id", "vec", s"$dir/base.fvecs")
    val base = Fvecs.read(spark, s"$dir/base.fvecs")
      .select(col("id").as("vec_id"), toDouble(col("vec")).as("vec"))
    // queries go through fvecs too: ivecs ground truth is POSITIONAL (row
    // i of the gt file answers query i of the query file), so query ids
    // must be the dense fvecs ids, exactly like the SIFT distribution
    Fvecs.write(
      base.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id"), col("vec").cast("array<float>")),
      "vec_id", "vec", s"$dir/query.fvecs")
    val queries = Fvecs.read(spark, s"$dir/query.fvecs")
      .select(col("id").as("query_id"), toDouble(col("vec")).as("qv"))
    // exact top-10 becomes the ivecs ground-truth file
    val exact = BruteForceKNN.knn(
      queries, base.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 10)
    Ivecs.write(
      exact.groupBy(col("query_id").as("id"))
        .agg(sort_array(collect_list(struct(col("rnk"), col("neighbor_id"))))
          .as("ranked"))
        .select(col("id"), col("ranked.neighbor_id").cast("array<int>").as("vec")),
      "id", "vec", s"$dir/gt.ivecs")
    val truth = RecallEval.truthFromIvecs(
      Ivecs.read(spark, s"$dir/gt.ivecs")
        .select(col("id"), col("vec")), k = 10)
    // a faithful search scores 1.0...
    val perfect = RecallEval.recallAtK(exact, truth, k = 10)
    assert(perfect.agg(min(col("recall"))).head().getDouble(0) == 1.0)
    // ...and the sharded HNSW search scores its gated recall through the
    // same evaluator
    val shards = DistributedHnsw.build(
      base, "vec_id", "vec", HnswParams(m = 16, efConstruction = 100),
      numShards = 2, seed = 3)
    val approx = DistributedHnsw.search(shards, queries, "query_id", "qv", 10)
    val perQuery = RecallEval.recallAtK(approx, truth, k = 10)
    val s = RecallEval.summary(perQuery).head()
    shards.unpersist()
    assert(s.getLong(0) == queries.count())
    assert(s.getDouble(1) >= 0.95, s"mean recall ${s.getDouble(1)}")
  }

  test("recallAtK keeps zero-hit queries as 0.0 rows (mean is corpus recall)") {
    val approx = Seq((1L, 100L, 1), (1L, 101L, 2), (2L, 200L, 1), (2L, 201L, 2))
      .toDF("query_id", "neighbor_id", "rnk")
    val truth = Seq((1L, 100L), (1L, 101L), (2L, 900L), (2L, 901L))
      .toDF("query_id", "neighbor_id")
    val r = RecallEval.recallAtK(approx, truth, k = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 1.0, 2L -> 0.0))
  }

  test("ivfNprobeCurve: the shared-scoring multi-nprobe pass equals independent single-nprobe runs") {
    // the curve scores every candidate ONCE at the widest probe set and
    // gates narrower settings by the cell's probe rank; this pins that
    // hoist to the per-setting calls (each of which reduces to the
    // single-setting computation when nprobes has one element)
    import graft.operators.IvfIndex
    val emb = Q.t(spark, sf0001, "embeddings").select(
      col("vec_id").cast("long").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val cents = emb.filter(col("id") < 4).orderBy(col("id"))
      .collect().map(_.getSeq[Double](1).toArray)
    val base = IvfIndex.assign(spark, emb, "id", "vec", cents)
    val q = emb.filter(col("id") % 10 === 0)
      .select(col("id").as("query_id"), col("vec").as("qv"))
    def run(nprobes: Seq[Int]) = RecallEval
      .ivfNprobeCurve(base, q, "query_id", "qv", cents, nprobes, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val multi = run(Seq(1, 2, 4))
    val singles = Seq(1, 2, 4).flatMap(np => run(Seq(np))).toSet
    assert(multi == singles,
      s"multi-nprobe pass diverged:\n  multi   $multi\n  singles $singles")
  }
}
