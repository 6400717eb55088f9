package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators._
import graft.queries.Q

/** SQ8 scalar quantization: quantization-rule invariants, distributed
  * train == local min/max, declarative decode == kernel decode, and the
  * codec plugged into distributed HNSW through the same VectorCompression
  * boundary as PQ (near-lossless recall — 256 levels per dimension).
  */
class SQSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Q.t(spark, sf0001, "embeddings")
    .select(col("vec_id"), toDouble(col("embedding")).as("vec"))

  test("round trip: decode(encode(v)) within half a quantization step per dim") {
    val model = ScalarQuantizer.train(emb, "vec")
    val vs = emb.limit(50).select(col("vec")).collect()
      .map(_.getSeq[Double](0).toArray)
    vs.foreach { v =>
      val r = model.decodeCode(model.encodeVec(v))
      var j = 0
      while (j < model.d) {
        val halfStep = (model.hi(j) - model.lo(j)) / 255.0 / 2.0
        assert(math.abs(r(j) - v(j)) <= halfStep + 1e-12,
          s"dim $j: |${r(j)} - ${v(j)}| > $halfStep")
        j += 1
      }
    }
  }

  test("range endpoints clamp to 0/255; degenerate span encodes 0, decodes lo") {
    val m = SQModel(Array(-1.0, 2.0, 5.0), Array(1.0, 4.0, 5.0)) // dim 2 degenerate
    assert(m.encodeVec(Array(-1.0, 2.0, 5.0)).toSeq == Seq(0, 0, 0))
    assert(m.encodeVec(Array(1.0, 4.0, 5.0)).toSeq == Seq(255, 255, 0))
    // out-of-range values clamp instead of wrapping
    assert(m.encodeVec(Array(-9.0, 9.0, 7.0)).toSeq == Seq(0, 255, 0))
    assert(m.decodeCode(Array[Short](0, 255, 0)).toSeq == Seq(-1.0, 4.0, 5.0))
  }

  test("distributed train equals local per-dimension min/max") {
    val model = ScalarQuantizer.train(emb, "vec")
    val vs = emb.select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
    val d = vs(0).length
    (0 until d).foreach { j =>
      assert(model.lo(j) == vs.map(_(j)).min, s"lo($j)")
      assert(model.hi(j) == vs.map(_(j)).max, s"hi($j)")
    }
  }

  test("declarative decodeCol is bit-identical to the kernel decode") {
    val model = ScalarQuantizer.train(emb, "vec")
    val viaCol = ScalarQuantizer
      .encodePartitioned(emb.limit(100), "vec_id", "vec", model)
      .select(col("vec_id"),
        ScalarQuantizer.decodeCol(model, col("code")).as("dv"))
      .as[(Long, Seq[Double])].collect().toMap
    val viaKernel = emb.limit(100)
      .select(col("vec_id"), col("vec")).as[(Long, Seq[Double])]
      .collect()
      .map { case (id, v) =>
        id -> model.decodeCode(model.encodeVec(v.toArray)).toSeq
      }.toMap
    assert(viaCol.keySet == viaKernel.keySet)
    viaCol.foreach { case (id, dv) =>
      assert(dv == viaKernel(id), s"vec $id decode mismatch")
    }
  }

  test("HNSW+SQ through the VectorCompression boundary: Recall@10 >= 0.9") {
    val comp = new SQCompression(ScalarQuantizer.train(emb, "vec"))
    val shards = DistributedHnsw.build(
      emb, "vec_id", "vec", HnswParams(m = 16, efConstruction = 100),
      numShards = 2, seed = 7, compression = Some(comp))
    assert(shards.codes.isDefined)
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("qv"))
    val approx = DistributedHnsw.search(
      shards, queries, "query_id", "qv", k = 10, compression = Some(comp))
    val exact = BruteForceKNN.knn(
      queries, emb.select(col("vec_id").as("neighbor_id"), col("vec").as("bv")), 10)
    val nQ = queries.count()
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .intersect(exact.select(col("query_id"), col("neighbor_id"))).count()
    val recall = hits.toDouble / (nQ * 10)
    shards.unpersist()
    // 8 bits per dimension is near-lossless for neighbor ranking — unlike
    // PQ's 0.4 gate, SQ should barely disturb the top-10
    assert(recall >= 0.9, s"SQ recall $recall")
  }
}
