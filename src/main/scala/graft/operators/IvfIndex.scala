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
  * ("cell") — one executor-side argmin against a plan-embedded centroid
  * table, zero shuffle — and [[build]] persists the result as
  * CELL-PARTITIONED parquet. Search ([[searchPartitioned]]): each query
  * probes only its `nprobe` nearest cells; the union of probed cells
  * (≤ nCells values — bounded by the centroid count, never by data size)
  * statically prunes the parquet scan to `PartitionFilters`, so at 100 TB
  * the candidate read is ~(nprobe/nCells) of the index, not a full scan.
  * The probe side carries NO broadcast hint: a small query batch is
  * auto-broadcast by AQE, a large one shuffles on the cell key — the
  * operator never caps the batch size at driver memory.
  *
  * With data-derived fixed centroids the whole operator is deterministic
  * (DuckDB-oracle-checkable); production centroids come from
  * [[KMeans.fit]] on a seeded sample.
  */
object IvfIndex {

  /** (id, vec, extra..., cell) assignment under the given coarse
    * centroids. `extraCols` carries metadata (labels, tenant keys,
    * timestamps) into the index so filtered searches can push predicates
    * straight to the index scan.
    */
  def assign(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      extraCols: Seq[String] = Nil
  ): DataFrame =
    df.select(
      col(idCol).as("id") +:
        col(vecCol).as("vec") +:
        extraCols.map(col) :+
        KMeans.assignCol(spark, centroids, col(vecCol)).as("cell"): _*
    )

  /** Materialize the index: cell-partitioned parquet. One directory per
    * cell, so a probed search reads only its cells' files.
    */
  def build(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      path: String,
      extraCols: Seq[String] = Nil
  ): Unit =
    assign(spark, df, idCol, vecCol, centroids, extraCols)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Open a [[build]]-written index; `cell` comes back as the partition
    * column, eligible for partition pruning.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-query probe set: the `nprobe` nearest cells, with the query
    * vector carried through the aggregation (no second scan of the query
    * side). Returns (qid, cell, qvec).
    */
  def probeCells(
      spark: SparkSession,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      centroids: Array[Array[Double]],
      nprobe: Int
  ): DataFrame = {
    import spark.implicits._
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "cvec")
    queries
      .crossJoin(broadcast(cents)) // genuinely tiny dim: |cells| rows
      .groupBy(col(qidCol))
      .agg(
        topK(
          l2SqFast(col(qvecCol), col("cvec")),
          col("cell").cast("long"), nprobe
        ).as("pc"),
        first(col(qvecCol)).as(qvecCol) // functionally dependent on qid
      )
      .select(col(qidCol), explode(col("pc.id")).as("cell"), col(qvecCol))
      .select(col(qidCol), col("cell").cast("int").as("cell"), col(qvecCol))
  }

  /** Per-executor memo of the centroid-HNSW used by [[probeCellsAnn]],
    * keyed by broadcast id: the graph build is deterministic (fixed seed,
    * insertion order = array order), so every executor materializes the
    * identical index once and shares it across partitions. Bounded — a
    * session cycling through many centroid sets clears the map rather
    * than accumulating dead graphs.
    */
  private val annIndexCache =
    new java.util.concurrent.ConcurrentHashMap[Long, HnswIndex]()

  /** ANN probe selection — the 100-TB path for LARGE cell counts. The
    * exact [[probeCells]] scores every query against every centroid:
    * |Q|·nCells·D work, fine at thousands of cells, dominant at the
    * 64k-1M cells a billion-vector IVF wants (nCells ~ sqrt(N)). Here
    * each executor builds ONE deterministic HNSW over the broadcast
    * centroid array and each query finds its nprobe cells in
    * O(log nCells) graph hops instead. Probe quality follows HNSW recall
    * (near-1 at production ef); with efSearch >= nCells the traversal is
    * exhaustive and the result matches [[probeCells]] exactly (spec-
    * gated). Same (qid, cell, qvec) shape — feed to
    * [[searchPartitionedWith]]. Query ids must be numeric (cast to long).
    */
  def probeCellsAnn(
      spark: SparkSession,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      centroids: Array[Array[Double]],
      nprobe: Int,
      params: HnswParams = HnswParams(m = 16, efConstruction = 100, efSearch = 128),
      seed: Long = 42L
  ): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val bcId = bc.id
    val p = params
    queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        if (annIndexCache.size > 8) annIndexCache.clear()
        val idx = annIndexCache.computeIfAbsent(
          bcId,
          _ => {
            val index = new HnswIndex(p, seed)
            bc.value.foreach(index.insert)
            index
          }
        )
        it.flatMap { case (qid, qv) =>
          idx.search(qv.toArray, nprobe).map { case (_, cell) =>
            (qid, cell, qv)
          }
        }
      }
      .toDF(qidCol, "cell", qvecCol)
      .select(col(qidCol), col("cell").cast("int").as("cell"), col(qvecCol))
  }

  /** Approximate top-k against an in-memory/assigned base (id, vec, cell).
    * Candidate scan = equi-join on the low-cardinality cell key; join
    * strategy is left to AQE (broadcast when the probe side is small,
    * shuffle when it isn't). Returns (query_id, neighbor_id, dist, rnk).
    */
  def search(
      spark: SparkSession,
      base: DataFrame, // (id, vec, cell) from [[assign]] or [[load]]
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      centroids: Array[Array[Double]],
      k: Int,
      nprobe: Int
  ): DataFrame =
    searchWithProbes(
      base,
      probeCells(spark, queries, qidCol, qvecCol, centroids, nprobe),
      qidCol, qvecCol, k
    )

  /** Candidate scan + per-query bounded-heap top-k over a precomputed
    * (qid, cell, qvec) probe table — shared by [[search]] and
    * [[searchPartitioned]] so the probe set is computed exactly once per
    * call.
    */
  private def searchWithProbes(
      base: DataFrame,
      probes: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int
  ): DataFrame =
    base
      .join(probes, "cell")
      .groupBy(col(qidCol))
      .agg(topK(l2SqFast(col(qvecCol), col("vec")), col("id"), k).as("tk"))
      .select(col(qidCol), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(
        col(qidCol),
        col("e.id").as("neighbor_id"),
        col("e.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk")
      )

  /** Approximate top-k against a [[build]]-written index with PARTITION
    * PRUNING: the distinct probed cells (≤ nCells ints — a bounded
    * driver-side list, not a data-sized collect) become a static partition
    * filter, so the scan reads only the probed directories.
    *
    * The probe set is evaluated ONCE: an eager `localCheckpoint`
    * materializes it (one pass over the query batch), and both consumers —
    * the partition-filter collect and the candidate join — read the
    * materialized copy. The checkpoint blocks are executor-side (spillable,
    * never a driver collect) and are released by Spark's ContextCleaner
    * once the result plan is dropped, so a long-lived session does not
    * accumulate probe caches.
    */
  def searchPartitioned(
      spark: SparkSession,
      indexPath: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      centroids: Array[Array[Double]],
      k: Int,
      nprobe: Int
  ): DataFrame =
    searchPartitionedWith(
      spark, indexPath,
      probeCells(spark, queries, qidCol, qvecCol, centroids, nprobe),
      qidCol, qvecCol, k
    )

  /** [[searchPartitioned]] over a caller-supplied (qid, cell, qvec) probe
    * table — from [[probeCells]] (exact) or [[probeCellsAnn]] (the large-
    * nCells path). The probe set is evaluated once (localCheckpoint) and
    * shared by the partition-filter collect and the candidate join.
    */
  def searchPartitionedWith(
      spark: SparkSession,
      indexPath: String,
      probeTable: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      baseFilter: Option[org.apache.spark.sql.Column] = None
  ): DataFrame = {
    val probes = probeTable.localCheckpoint()
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val pruned = load(spark, indexPath)
      .filter(col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
    // a metadata predicate (FILTERED ANN) composes with the partition
    // pruning: the cell filter prunes directories, the attribute filter
    // pushes to parquet row groups — both reductions happen at the scan
    val base = baseFilter.fold(pruned)(pruned.filter)
    searchWithProbes(base, probes, qidCol, qvecCol, k)
  }
}
