package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.IvfIndex
import Q._

/** IVF approximate-NN query surface under fixed data-derived coarse
  * centroids (embeddings vec_id < 8) — deterministic, so the full
  * build+probe+scan pipeline is DuckDB-oracle-checked. nprobe=2 of 8
  * cells ~ 4x scan reduction; the same operator takes KMeans-trained
  * centroids in production.
  */
object IvfQueries {

  private val NCELLS = 8
  private val NPROBE = 2
  private val K = 5

  /** Data-derived fixed coarse centroids (embeddings vec_id < NCELLS). */
  private def fixedCentroids(
      spark: org.apache.spark.sql.SparkSession,
      dir: String
  ): Array[Array[Double]] =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < NCELLS)
      .orderBy(col("vec_id"))
      .select(toDouble(col("embedding")))
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** One cell-partitioned index build per sf dir (immutable artifact —
    * reuse across query invocations is free; same pattern as
    * [[HnswQueries]]'s shared build).
    */
  private val indexCache = scala.collection.concurrent.TrieMap.empty[String, String]

  private def sharedIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      cents: Array[Array[Double]]
  ): String =
    indexCache.getOrElseUpdate(
      dir, {
        val emb = t(spark, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
        val path = java.nio.file.Files
          .createTempDirectory("graft-ivf").toString + "/index"
        IvfIndex.build(spark, emb, "vec_id", "vec", cents, path)
        path
      }
    )

  val all: Seq[GQuery] = Seq(
    GQuery(
      "ivf_knn",
      (spark, dir) => {
        val emb = t(spark, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
        val cents = fixedCentroids(spark, dir)
        val index = sharedIndex(spark, dir, cents)
        val q = emb
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("query_id"), col("vec").as("qv"))
        IvfIndex
          .searchPartitioned(spark, index, q, "query_id", "qv", cents, K, NPROBE)
          .select(
            col("query_id"), col("neighbor_id"),
            round(col("dist"), 6).as("dist"),
            col("rnk").cast("long").as("rnk")
          )
      },
      Some(s"""
        WITH cent AS (SELECT vec_id AS ck, embedding::DOUBLE[] AS cv
                      FROM embeddings WHERE vec_id < $NCELLS),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        ad AS (SELECT e.vec_id, cent.ck, ${sqlL2Sq("e.ev", "cent.cv")} AS dist
               FROM e CROSS JOIN cent),
        assigned AS (SELECT vec_id, ck AS cell FROM (
                       SELECT vec_id, ck,
                              row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY dist, ck) AS rn
                       FROM ad) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, ev AS qv FROM e WHERE vec_id % 10 = 0),
        pd AS (SELECT q.query_id, cent.ck, ${sqlL2Sq("q.qv", "cent.cv")} AS dist
               FROM q CROSS JOIN cent),
        probes AS (SELECT query_id, ck AS cell FROM (
                     SELECT query_id, ck,
                            row_number() OVER (PARTITION BY query_id
                                               ORDER BY dist, ck) AS rn
                     FROM pd) WHERE rn <= $NPROBE),
        cd AS (SELECT q.query_id, a.vec_id AS neighbor_id,
                      ${sqlL2Sq("q.qv", "e.ev")} AS dist
               FROM q
               JOIN probes p ON p.query_id = q.query_id
               JOIN assigned a ON a.cell = p.cell
               JOIN e ON e.vec_id = a.vec_id),
        r AS (SELECT query_id, neighbor_id, dist,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY dist, neighbor_id) AS rnk
              FROM cd)
        SELECT query_id, neighbor_id, round(dist, 6) AS dist, rnk
        FROM r WHERE rnk <= $K
      """)
    )
  )
}
