package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg.topK
import graft.functions.VectorExpressions._

/** IVF (inverted-file) approximate nearest neighbor — the bucketed scale
  * path for similarity search (SURVEY.md §2 C7/M7 extension surface;
  * coarse quantizer per Jégou et al. 2011, the same paper as PQ).
  *
  * Build: assign every base vector to its nearest coarse centroid
  * ("cell") — one executor-side argmin against a broadcast centroid
  * table, zero shuffle beyond the write. Search: each query probes only
  * its `nprobe` nearest cells, so the candidate set shrinks by roughly
  * (nprobe / nCells) versus a full scan; candidates equi-join on the cell
  * id (a hash join on a low-cardinality key — at 100 TB the base table is
  * cell-partitioned parquet and the probe prunes partitions).
  *
  * With data-derived fixed centroids the whole operator is deterministic
  * (DuckDB-oracle-checkable); production centroids come from
  * [[KMeans.fit]] on a seeded sample.
  */
object IvfIndex {

  /** (id, cell) assignment under the given coarse centroids. */
  def assign(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]
  ): DataFrame =
    df.select(
      col(idCol).as("id"),
      col(vecCol).as("vec"),
      KMeans.assignCol(spark, centroids, col(vecCol)).as("cell")
    )

  /** Approximate top-k: probe the `nprobe` nearest cells per query, scan
    * only those cells' vectors exactly, bounded-heap merge. Returns
    * (query_id, neighbor_id, dist, rnk).
    */
  def search(
      spark: SparkSession,
      base: DataFrame, // (id, vec, cell) from [[assign]]
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      centroids: Array[Array[Double]],
      k: Int,
      nprobe: Int
  ): DataFrame = {
    import spark.implicits._
    // per query: the nprobe nearest cells (tiny: |Q| x nCells argmin-k,
    // centroid list broadcast)
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
    val probes = queries
      .crossJoin(broadcast(cents))
      .groupBy(col(qidCol))
      .agg(
        topK(
          l2SqFast(col(qvecCol), col("cvec")),
          col("cell").cast("long"), nprobe
        ).as("pc")
      )
      .select(col(qidCol), explode(col("pc.id")).as("cell"))
      .join(broadcast(queries), qidCol)
      .select(col(qidCol), col("cell").cast("int").as("cell"), col(qvecCol))
    // candidate scan: hash join on the low-cardinality cell key
    base
      .join(broadcast(probes), "cell")
      .groupBy(col(qidCol))
      .agg(topK(l2SqFast(col(qvecCol), col("vec")), col("id"), k).as("tk"))
      .select(col(qidCol), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(
        col(qidCol),
        col("e.id").as("neighbor_id"),
        col("e.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk")
      )
  }
}
