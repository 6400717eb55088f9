package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorFunctions

/** Facility-location greedy selection — submodular coverage maximization:
  * pick k representatives S maximizing F(S) = Σ_x max_{s∈S} sim(x, s),
  * the "every corpus point is well-represented by someone chosen" objective
  * (Krause & Golovin, "Submodular Function Maximization", 2014; the
  * standard exemplar-selection objective in training-data curation).
  * Greedy is (1 − 1/e)-optimal for monotone submodular F.
  *
  * Complements the engine's other selectors: k-center minimizes the WORST
  * point's distance (outlier-sensitive cover), facility location maximizes
  * AVERAGE representation (density-seeking cover); PageRank/HITS rank by
  * graph centrality without choosing a cover at all.
  *
  * Spark shape, built for the 100 TB case:
  *  - candidates come from a bounded deterministic pool (id % mod == 0 —
  *    in production a cluster-representative table), collected and
  *    broadcast: m·d doubles, the same bounded-collect contract as the
  *    centroid fits;
  *  - similarities to the pool are computed ONCE into a width-m array
  *    column (zero shuffle, one scan), then each greedy round is ONE
  *    whole-corpus aggregate with m decimal-exact marginal-gain sums —
  *    no per-round shuffle, no N×m pair table, k linear passes total;
  *  - the running best-similarity column (`cur`) is updated map-only per
  *    round with localCheckpoint lineage truncation (the coreset pattern).
  *
  * Determinism: sim = (1 + cosine)/2 via ascending-left-fold dots (the
  * [[VectorFunctions]] portability contract), marginal gains are
  * DECIMAL(38,30) sums (order-free), argmax ties break to the lowest
  * candidate id, picked candidates are excluded from later rounds — every
  * float replays in DuckDB, so the full greedy trajectory hash-checks.
  */
object FacilityLocation {

  /** Greedy-select `k` exemplars from the pool `idCol % poolMod == 0`.
    * Returns one row per round: (rnd, center_id, gain) where gain is the
    * decimal-exact marginal objective increase of that pick.
    */
  def greedy(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      poolMod: Long
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dec = DecimalType(38, 30)

    val corpus = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))

    // bounded candidate pool, broadcast via literals (m·d doubles)
    val pool: Array[(Long, Seq[Double])] = corpus
      .filter(col("id") % poolMod === 0)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(pool.nonEmpty, "empty candidate pool")
    require(k <= pool.length, s"k=$k > pool size ${pool.length}")

    def unitSim(c: Seq[Double]): Column = {
      val cl = typedLit(c)
      (lit(1.0) + VectorFunctions.dot(col("v"), cl) /
        (VectorFunctions.l2Norm(col("v")) * VectorFunctions.l2Norm(cl))) / 2.0
    }

    // one scan: width-m similarity array + cur = 0; checkpoint once
    var state = corpus
      .select(
        col("id"),
        array(pool.map { case (_, c) => unitSim(c) }: _*).as("sims"),
        lit(0.0).as("cur"))
      .localCheckpoint()

    val picked = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val taken = scala.collection.mutable.HashSet[Int]()
    var rnd = 1
    while (rnd <= k) {
      val open = pool.indices.filterNot(taken)
      val gains = state
        .agg(
          sum((greatest(col("sims")(open.head), col("cur")) - col("cur")).cast(dec)),
          open.tail.map(i =>
            sum((greatest(col("sims")(i), col("cur")) - col("cur")).cast(dec))): _*)
        .head()
      // argmax by (gain DESC, candidate id ASC) — double compare, same
      // as the oracle's ORDER BY
      var bestPos = 0
      var bestGain = gains.getDecimal(0).doubleValue()
      var p = 1
      while (p < open.length) {
        val g = gains.getDecimal(p).doubleValue()
        if (g > bestGain) { bestGain = g; bestPos = p }
        p += 1
      }
      val bi = open(bestPos)
      taken += bi
      picked += ((rnd.toLong, pool(bi)._1, bestGain))
      if (rnd < k) {
        state = state
          .withColumn("cur", greatest(col("sims")(bi), col("cur")))
          .localCheckpoint()
      }
      rnd += 1
    }
    picked.toSeq.toDF("rnd", "center_id", "gain")
  }
}
