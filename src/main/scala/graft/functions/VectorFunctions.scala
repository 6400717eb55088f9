package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector scalar functions as native Spark column expressions (whole-stage
  * codegen'd — no UDF boxing).
  *
  * Semantics follow the reference's distance kernels: squared L2 (no sqrt),
  * `Double` accumulation left-to-right over the dimensions
  * (ref: py/hnsw.py:191-203, py/pq.py:57-61, py/bruteforce.py:5-9).
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> (exact widening). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Squared L2 distance: sum_i (a_i - b_i)^2, double accumulation in array
    * order. Ref: py/bruteforce.py:5-9.
    */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Dot product with double accumulation in array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot(a,b) / (|a||b|). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Contiguous subvector slice m (0-based) of width dp — the PQ subspace
    * split (ref: py/pq.py:63-78 `_SplitVector`).
    */
  def subvector(a: Column, m: Int, dp: Int): Column =
    slice(a, m * dp + 1, dp)
}
