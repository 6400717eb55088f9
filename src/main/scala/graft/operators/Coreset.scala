package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.l2SqFast

/** k-center greedy (farthest-first traversal) coreset selection — the
  * classic 2-approximation to the k-center cover (Gonzalez 1985) and the
  * standard geometric data-selection / active-learning baseline ("select
  * the examples that cover embedding space", Sener & Savarese 2018):
  * start from a canonical seed and repeatedly add the point FARTHEST
  * from the current center set. The selection order is itself the
  * output — a size-k coreset whose prefix of any length j is the j-cover.
  *
  * Fully deterministic: seed = min id, ties on (distance DESC, id ASC) —
  * so the whole iterative greedy replays under an exact recursive-CTE
  * oracle (the knn_mmr pattern: state = chosen-id list).
  *
  * Spark shape per round: one map over the remaining points (update the
  * running min-distance against the ONE new center — a broadcast scalar,
  * not a join), one TakeOrdered(1) argmax. k rounds = k linear passes,
  * never a pairwise table; driver state is k rows. The running-min
  * column makes each round O(n·D) instead of the naive O(n·|centers|·D).
  */
object Coreset {

  /** Returns (rnd 1..k, center_id, radius): the selection order, and for
    * each added center the max-min-distance that selected it — the
    * coverage radius of the PREVIOUS center set (null for the seed).
    */
  def kCenterGreedy(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"coreset size must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val seed = v.orderBy(col("id")).limit(1)
      .select(col("id"), col("vec")).head()
    val seedId = seed.getLong(0)
    val seedVec = seed.getSeq[Double](1)
    val centers =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])](
        (1L, seedId, None))
    // state = remaining points with their running min-dist² to the chosen
    // set; each round re-evaluates ONE new-center distance and keeps the
    // min — localCheckpoint truncates the k-deep lineage
    var state = v
      .filter(col("id") =!= seedId)
      .withColumn("md", l2SqFast(col("vec"), typedLit(seedVec)))
      .localCheckpoint()
    var r = 2
    while (r <= k && state.limit(1).count() == 1) {
      val pick = state
        .orderBy(col("md").desc, col("id").asc).limit(1).head()
      val pid = pick.getLong(0)
      val pvec = pick.getSeq[Double](1)
      centers += ((r.toLong, pid, Some(pick.getDouble(2))))
      state = state
        .filter(col("id") =!= pid)
        .withColumn("md",
          least(col("md"), l2SqFast(col("vec"), typedLit(pvec))))
        .localCheckpoint()
      r += 1
    }
    centers.toSeq
      .toDF("rnd", "center_id", "radius")
      .select(col("rnd"), col("center_id"),
        col("radius").cast("double").as("radius"))
  }
}
