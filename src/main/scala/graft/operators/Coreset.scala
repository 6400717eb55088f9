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
  * Spark shape: exact farthest-first is inherently sequential, but the
  * CLUSTER round-trips are not — each round collects the TOP-`batch`
  * remaining points by running min-distance (one TakeOrdered action)
  * and then accepts greedy picks from that buffer on the driver for as
  * long as they are PROVABLY the global argmax: a buffered candidate
  * whose distance, updated against the centers accepted from the same
  * buffer, still meets or beats the buffer's cutoff (the `batch`-th
  * collected distance — an upper bound on every uncollected point,
  * whose running min can only shrink) is exactly the pick sequential
  * greedy would make. Identical output to batch = 1, but k centers cost
  * ~k/accepted-per-round Spark jobs instead of 3k. Between rounds the
  * running-min column folds ALL newly accepted centers in one map
  * (`least` chain over plan-literal vectors); localCheckpoint truncates
  * the lineage. Driver state is O(batch) rows, O(batch²·D) arithmetic
  * per round.
  */
object Coreset {

  /** Returns (rnd 1..k, center_id, radius): the selection order, and for
    * each added center the max-min-distance that selected it — the
    * coverage radius of the PREVIOUS center set (null for the seed).
    *
    * @param batch candidate buffer collected per cluster round-trip;
    *              any value returns the identical exact greedy sequence
    *              (picks beyond the provable-argmax prefix are discarded
    *              and re-fetched), it only tunes jobs-per-center.
    */
  def kCenterGreedy(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      batch: Int = 16
  ): DataFrame = {
    require(k >= 1, s"coreset size must be >= 1, got $k")
    require(batch >= 1, s"candidate batch must be >= 1, got $batch")
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
    def l2Sq(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // state = remaining points with their running min-dist² to the chosen
    // set; each round folds the newly accepted centers into the min —
    // localCheckpoint truncates the growing lineage
    var state = v
      .filter(col("id") =!= seedId)
      .withColumn("md", l2SqFast(col("vec"), typedLit(seedVec)))
      .localCheckpoint()
    while (centers.length < k) {
      // ONE action: the top-`batch` remaining points by (md DESC, id ASC)
      val buf = state
        .orderBy(col("md").desc, col("id").asc)
        .limit(batch)
        .collect()
      if (buf.isEmpty) {
        // corpus exhausted before k centers — return what exists
        return centers.toSeq
          .toDF("rnd", "center_id", "radius")
          .select(col("rnd"), col("center_id"),
            col("radius").cast("double").as("radius"))
      }
      // cutoff = an upper bound on the updated md of every point NOT in
      // the buffer (its collected md bounds its updated md); when the
      // buffer is the whole remainder there is no outside point to beat
      val cutoff =
        if (buf.length < batch) Double.NegativeInfinity
        else buf.last.getDouble(2)
      val accepted = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])]()
      // driver-side exact greedy over the buffer: updated md = collected
      // md (already folds all pre-round centers) min distance to centers
      // accepted from this same buffer
      val upd = buf.map(r =>
        (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      var live = upd.toBuffer
      var firstPick = true
      var continue = true
      while (continue && centers.length < k && live.nonEmpty) {
        var bi = 0
        var i = 1
        while (i < live.length) {
          val c = live(i); val b = live(bi)
          if (c._3 > b._3 || (c._3 == b._3 && c._1 < b._1)) bi = i
          i += 1
        }
        val best = live(bi)
        // the round's FIRST pick is the global argmax by construction
        // (the collect was a global (md DESC, id ASC) head and no center
        // has been added since); later picks must clear the cutoff
        // STRICTLY — at equality an uncollected point could win the
        // id tie-break
        if (firstPick || best._3 > cutoff) {
          firstPick = false
          centers += ((centers.length + 1L, best._1, Some(best._3)))
          accepted += ((best._1, best._2))
          live.remove(bi)
          live = live.map { case (id, vec, md) =>
            (id, vec, math.min(md, l2Sq(vec, best._2)))
          }
        } else continue = false // argmax may be outside the buffer — refetch
      }
      if (centers.length < k) {
        val acceptedIds = accepted.map(_._1).toSet
        val newMd = accepted.foldLeft(col("md")) { (acc, c) =>
          least(acc, l2SqFast(col("vec"), typedLit(c._2)))
        }
        state = state
          .filter(!col("id").isInCollection(acceptedIds))
          .withColumn("md", newMd)
          .localCheckpoint()
      }
    }
    centers.toSeq
      .toDF("rnd", "center_id", "radius")
      .select(col("rnd"), col("center_id"),
        col("radius").cast("double").as("radius"))
  }

  /** Exact sequential farthest-first over an in-memory point set —
    * seed = min id, ties (distance DESC, id ASC); the shared kernel of
    * the composable path's local and merge stages. Returns
    * (rnd 1.., id, radius) with radius = the max-min distance that
    * selected the center (NaN encodes the seed's null).
    */
  private def greedyLocal(
      pts: Array[(Long, Array[Double])],
      k: Int
  ): Array[(Int, Long, Double)] = {
    if (pts.isEmpty) return Array.empty
    val sorted = pts.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)](
      (1, sorted(0)._1, Double.NaN))
    val md = Array.fill(sorted.length)(Double.PositiveInfinity)
    var last = 0
    var r = 2
    while (r <= k && out.length < sorted.length) {
      var bi = -1
      var i = 0
      while (i < sorted.length) {
        val d = {
          var s = 0.0; var j = 0
          val a = sorted(i)._2; val b = sorted(last)._2
          while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
          s
        }
        if (d < md(i)) md(i) = d
        if (md(i) > 0 &&
          (bi < 0 || md(i) > md(bi) ||
            (md(i) == md(bi) && sorted(i)._1 < sorted(bi)._1))) bi = i
        i += 1
      }
      if (bi < 0) return out.toArray // all points coincide with centers
      out += ((r, sorted(bi)._1, md(bi)))
      last = bi
      r += 1
    }
    out.toArray
  }

  /** COMPOSABLE (sharded) k-center — the corpus-scale path: points
    * shard deterministically by md5(id) (partition contents depend on
    * nothing but the data, so the whole computation is engine-portable
    * and hash-checkable), each shard runs the exact local greedy in one
    * `flatMapGroups` pass (O(n/P·k·D) per shard, no driver rounds at
    * all), and the P·k local centers — a tiny candidate set — are
    * merge-greedied into the final k. The classic composable-coreset
    * two-level scheme: constant-factor approximation of the optimal
    * k-center cover with exactly ONE distributed pass over the corpus,
    * vs the sequential greedy's k rounds. `radius` in the output is the
    * merge stage's max-min distance over the CANDIDATE set (an index of
    * the selection order, not the corpus coverage radius — CoresetSpec
    * gates the true corpus radius against the sequential greedy's).
    *
    * @param parts shard count; each shard's points must fit one task's
    *              memory (choose parts ≈ n·D·8 / task-heap at scale)
    */
  def kCenterComposable(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      parts: Int
  ): DataFrame = {
    require(k >= 1 && parts >= 1, s"need k >= 1 and parts >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df
      .select(
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      .withColumn("pid",
        pmod(Dedup.md5Long(concat(col("id").cast("string"), lit(":kcshard"))),
          lit(parts.toLong)).cast("int"))
    val localCenters = v
      .select(col("pid"), col("id"), col("vec"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (pid, it) =>
        val pts = it.map(t => (t._2, t._3.toArray)).toArray
        greedyLocal(pts, k).iterator.map { case (_, id, _) => (pid, id) }
      }
      .toDF("pid", "id")
    // merge stage: P·k candidates — bounded, collected once
    val cands = localCenters
      .join(v.select(col("id"), col("vec")), "id")
      .select(col("id"), col("vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    greedyLocal(cands, k).toSeq
      .map { case (r, id, rad) =>
        (r.toLong, id, if (rad.isNaN) None else Some(rad))
      }
      .toDF("rnd", "center_id", "radius")
      .select(col("rnd"), col("center_id"),
        col("radius").cast("double").as("radius"))
  }
}
