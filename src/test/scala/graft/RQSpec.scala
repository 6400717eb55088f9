package graft

import org.apache.spark.sql.functions._

import graft.operators.ResidualQuantizer
import graft.queries.Q

/** Residual (multi-stage) VQ gates: the trained codec must actually
  * contract the residual stage over stage, and the column chain must
  * reproduce the driver kernel bit-for-bit.
  */
class RQSpec extends SparkSpec {
  import spark.implicits._

  private def sampleVecs(n: Int): Array[Array[Double]] =
    Q.t(spark, sf0001, "embeddings")
      .orderBy(col("vec_id")).limit(n)
      .select(graft.functions.VectorFunctions.toDouble(col("embedding")))
      .collect()
      .map(_.getSeq[Double](0).toArray)

  private def mse(model: ResidualQuantizer.RQModel, vs: Array[Array[Double]]): Double =
    vs.map { v =>
      val r = ResidualQuantizer.reconLocal(model, ResidualQuantizer.encodeLocal(model, v))
      graft.operators.KMeansLocal.l2Sq(v, r)
    }.sum / vs.length

  test("trained RVQ: every added stage strictly shrinks reconstruction MSE") {
    val vs = sampleVecs(400)
    val mses = (1 to 3).map(m =>
      mse(ResidualQuantizer.trainLocal(vs, m, k = 16, seed = 11), vs))
    assert(mses(0) > mses(1) && mses(1) > mses(2), mses)
    // and the codec is deterministic under the seed
    val again = mse(ResidualQuantizer.trainLocal(vs, 3, k = 16, seed = 11), vs)
    assert(again == mses(2))
  }

  test("encodeCol/reconCol == driver kernel, bit-for-bit, on real vectors") {
    val vs = sampleVecs(300)
    val model = ResidualQuantizer.trainLocal(vs, m = 2, k = 16, seed = 5)
    val df = Q.t(spark, sf0001, "embeddings")
      .orderBy(col("vec_id")).limit(300)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val rq = ResidualQuantizer
    val got = df
      .select(col("vec_id"),
        rq.encodeCol(spark, model, col("v")).as("codes"),
        rq.reconCol(model, rq.encodeCol(spark, model, col("v"))).as("recon"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Int](1).toArray,
        r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    val ids = df.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    got.zip(ids.zip(vs)).foreach { case ((gid, codes, recon), (id, v)) =>
      assert(gid == id)
      val want = rq.encodeLocal(model, v)
      assert(codes.sameElements(want), s"id $id: ${codes.toSeq} vs ${want.toSeq}")
      assert(recon.sameElements(rq.reconLocal(model, want)), s"id $id recon")
    }
  }

  test("2-stage ADC estimate equals decode-then-L2 up to float noise") {
    val vs = sampleVecs(200)
    val model = ResidualQuantizer.trainLocal(vs, m = 2, k = 16, seed = 3)
    val nrm = ResidualQuantizer.pairNormTable(model)
    val q = vs(7)
    val qq = q.map(x => x * x).sum
    vs.take(50).foreach { v =>
      val codes = ResidualQuantizer.encodeLocal(model, v)
      val recon = ResidualQuantizer.reconLocal(model, codes)
      val exact = graft.operators.KMeansLocal.l2Sq(q, recon)
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var j = 0
        while (j < a.length) { s += a(j) * b(j); j += 1 }; s
      }
      val est = qq - 2 * dot(q, model.codebooks(0)(codes(0))) -
        2 * dot(q, model.codebooks(1)(codes(1))) + nrm(codes(0))(codes(1))
      assert(math.abs(est - exact) <= 1e-7 * math.max(1.0, exact),
        s"est $est vs exact $exact")
    }
    // the serving table is a 2-stage shape by contract
    val e = intercept[IllegalArgumentException] {
      ResidualQuantizer.pairNormTable(
        ResidualQuantizer.trainLocal(vs, m = 3, k = 8, seed = 1))
    }
    assert(e.getMessage.contains("2-stage"))
  }

  test("oversized stage count still trains (k > residual diversity is absorbed)") {
    // 4 identical vectors, k=3: stage 0 nails them, later stages quantize
    // a zero residual — MSE 0, no crash, codes defined
    val vs = Array.fill(4)(Array.tabulate(8)(_.toDouble))
    val m = ResidualQuantizer.trainLocal(vs, m = 2, k = 3, seed = 1)
    assert(mse(m, vs) == 0.0)
    assert(ResidualQuantizer.encodeLocal(m, vs(0)).length == 2)
  }
}
