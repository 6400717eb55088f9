package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions._

/** Exact k-nearest-neighbor search by full scan — the correctness oracle
  * (ref: py/bruteforce.py:11-19 `RunSearch`).
  *
  * Shape: similarity (theta) join `queries × base` with the distance as a
  * codegen'd array expression, then top-k per query. The query side is
  * broadcast — at 100 TB the base table is the big side and streams through
  * executors partition-by-partition while every executor holds the (small)
  * query batch; no shuffle of the base data at all. The per-query top-k is a
  * rank-window over |Q|·k candidates after a partial per-partition prune
  * (see [[graft.operators.TopK]] for the bounded-heap aggregate used when
  * |Q| is large).
  *
  * Results are `(query_id, neighbor_id, dist, rnk)` ascending by
  * `(dist, neighbor_id)` — squared L2, stable tie-break on id, matching the
  * reference's stable sort (ref: py/bruteforce.py:17).
  */
object BruteForceKNN {

  /** Exact top-k join.
    *
    * @param queries DataFrame with columns (`qidCol`: long, `qvecCol`: array)
    * @param base    DataFrame with columns (`bidCol`: long, `bvecCol`: array)
    */
  def knn(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      qidCol: String = "query_id",
      qvecCol: String = "qv",
      bidCol: String = "neighbor_id",
      bvecCol: String = "bv"
  ): DataFrame = {
    val pairs = base
      .join(broadcast(queries))
      .withColumn("dist", l2SqFast(col(qvecCol), col(bvecCol)))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist"), col(bidCol))
    pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qidCol), col(bidCol), col("dist"), col("rnk"))
  }

  /** Same, by cosine similarity descending (ties broken by ascending id) —
    * the similarity-search flavor used by the embedding near-dup and ANN
    * baselines.
    */
  def knnCosine(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      qidCol: String = "query_id",
      qvecCol: String = "qv",
      bidCol: String = "neighbor_id",
      bvecCol: String = "bv"
  ): DataFrame = {
    // norms are per-row invariants: compute each once before the join
    // instead of three dot products per pair (same doubles, 1/3 the work)
    val qn = queries.withColumn("qnorm", sqrt(dotFast(col(qvecCol), col(qvecCol))))
    val bn = base.withColumn("bnorm", sqrt(dotFast(col(bvecCol), col(bvecCol))))
    val pairs = bn
      .join(broadcast(qn))
      .withColumn(
        "sim",
        dotFast(col(qvecCol), col(bvecCol)) / (col("qnorm") * col("bnorm"))
      )
    val w =
      Window.partitionBy(col(qidCol)).orderBy(col("sim").desc, col(bidCol))
    pairs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qidCol), col(bidCol), col("sim"), col("rnk"))
  }
}
