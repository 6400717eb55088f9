package graft

import org.apache.spark.sql.functions._

import graft.operators.RecallEval

/** Invariants for the MRR / nDCG evaluation operator. */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def rank(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("query_id", "neighbor_id", "rnk")

  test("perfect ranking scores rr = 1 and ndcg = 1; disjoint scores 0") {
    val truth = rank(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)))
    val perfect = RecallEval.rankMetrics(truth, truth, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(perfect.toSeq == Seq((1L, 1.0, 1.0)))
    val disjoint = rank(Seq((1L, 90L, 1L), (1L, 91L, 2L), (1L, 92L, 3L)))
    val z = RecallEval.rankMetrics(disjoint, truth, k = 3).head()
    assert(z.getDouble(1) == 0.0 && z.getDouble(2) == 0.0)
  }

  test("hand-computed partial overlap: rr = 1/2, dcg positions 2 and 3") {
    // approx ranks truth's top-1 at position 2 and truth's #2 at position 3
    val truth = rank(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)))
    val approx = rank(Seq((1L, 99L, 1L), (1L, 10L, 2L), (1L, 11L, 3L)))
    val m = RecallEval.rankMetrics(approx, truth, k = 3).head()
    assert(m.getDouble(1) == 0.5, s"rr ${m.getDouble(1)}")
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = 1.0 / l2(3.0) + 1.0 / l2(4.0)
    val idcg = 1.0 / l2(2.0) + 1.0 / l2(3.0) + 1.0 / l2(4.0)
    assert(math.abs(m.getDouble(2) - dcg / idcg) < 1e-12,
      s"ndcg ${m.getDouble(2)} vs ${dcg / idcg}")
  }

  test("short truth lists: ideal uses min(k, |truth|) positions") {
    // one relevant item, ranked first by approx -> ndcg must be exactly 1
    val truth = rank(Seq((7L, 42L, 1L)))
    val approx = rank(Seq((7L, 42L, 1L), (7L, 43L, 2L)))
    val m = RecallEval.rankMetrics(approx, truth, k = 10).head()
    assert(m.getDouble(1) == 1.0 && m.getDouble(2) == 1.0, m.toString)
  }
}
