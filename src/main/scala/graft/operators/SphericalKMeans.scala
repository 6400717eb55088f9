package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorExpressions._

/** Spherical k-means (Dhillon & Modha 2001) — k-means on the unit
  * sphere, the clustering convention embedding pipelines standardize on
  * (SemDeDup's blocking step, IVF coarse quantizers for cosine serving):
  * inputs are l2-normalized once, assignment maximizes cosine, the
  * M-step mean is RENORMALIZED back onto the sphere.
  *
  * Deterministic by the engine's established discipline: init is the
  * md5-coin k-means++ ([[KMeans.ppInitDet]]) run on the NORMALIZED
  * table (picked points are already unit vectors); assignment is the
  * argmin-L2² native kernel over unit vectors — on the sphere
  * ‖v−c‖² = 2−2·cos, so argmin L2² IS argmax cosine, and reusing the
  * one kernel keeps tie semantics (ties → lowest cluster index)
  * identical to the flat family; the per-(cluster, dim) mean routes
  * through DECIMAL(38,30) (exact, order-independent), and the
  * renormalization is a driver-side fold over the k×d means in
  * dimension order — both engines divide the same doubles. Empty
  * clusters and zero-norm means keep their previous centroid.
  *
  * Scale per round: ONE corpus scan (broadcast k×d matrix, codegen'd
  * argmin — no join, no shuffle beyond the (k·d)-row partial mean
  * aggregate); normalization is a map. The whole fixed-round schedule
  * replays as unrolled SQL rounds.
  */
object SphericalKMeans {

  /** l2-normalize (id, vec) — rows with zero norm are dropped (they
    * have no direction; embeddings tables don't produce them).
    */
  def normalize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("raw"))
      .withColumn("nrm", sqrt(dotFast(col("raw"), col("raw"))))
      .filter(col("nrm") > 0)
      .select(
        col("id"),
        transform(col("raw"), x => x / col("nrm")).as("vec"))

  /** Fixed-round deterministic spherical fit: md5-coin k-means++ init on
    * the normalized table, then `rounds` assign/mean/renormalize steps.
    *
    * @return (cluster, pos, mval) — unit centroids, pos 1-based
    */
  def fitDeterministic(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rounds: Int
  ): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val spark = df.sparkSession
    import spark.implicits._
    val unit = normalize(df, idCol, vecCol).localCheckpoint()
    var centroids = KMeans.ppInitDet(unit, "id", "vec", k)
      .orderBy(col("rnd"))
      .collect()
      .map(_.getSeq[Double](2).toArray)
    var r = 0
    while (r < rounds) {
      val means = unit
        .withColumn("c", KMeans.assignCol(spark, centroids, col("vec")))
        .select(col("c"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("c"), col("pos"))
        .agg((sum(col("x").cast(DecimalType(38, 30))).cast("double")
          / count(lit(1))).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      val touched = Array.ofDim[Boolean](k)
      val mean = Array.ofDim[Double](k, centroids(0).length)
      means.foreach { row =>
        mean(row.getInt(0))(row.getInt(1)) = row.getDouble(2)
        touched(row.getInt(0)) = true
      }
      var c = 0
      while (c < k) {
        if (touched(c)) {
          // dimension-order fold, the oracle's list_sum spelling
          var s = 0.0
          var p = 0
          while (p < mean(c).length) { s += mean(c)(p) * mean(c)(p); p += 1 }
          val nrm = math.sqrt(s)
          if (nrm > 0) {
            p = 0
            while (p < mean(c).length) { next(c)(p) = mean(c)(p) / nrm; p += 1 }
          }
        }
        c += 1
      }
      centroids = next
      r += 1
    }
    centroids.zipWithIndex
      .flatMap { case (cv, ci) =>
        cv.zipWithIndex.map { case (x, pos) => (ci.toLong, pos + 1L, x) }
      }
      .toSeq
      .toDF("cluster", "pos", "mval")
  }

  /** Serving E-step under frozen unit centroids: (id, cluster, sim) with
    * sim = cosine of the point to its centroid (the SemDeDup blocking
    * signal). Assignment is the same argmin-L2²-over-unit-vectors kernel
    * as the fit; one broadcast scan, no shuffle.
    */
  def assign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]
  ): DataFrame = {
    val spark = df.sparkSession
    val unit = normalize(df, idCol, vecCol)
    unit
      .withColumn("cluster", KMeans.assignCol(spark, centroids, col("vec")).cast("long"))
      .withColumn("cv", {
        val lookup = typedLit(centroids.map(_.toSeq).toSeq)
        element_at(lookup, (col("cluster") + 1).cast("int"))
      })
      .select(
        col("id"),
        col("cluster"),
        dotFast(col("vec"), col("cv")).as("sim"))
  }
}
