package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg.topK

/** Sharded HNSW over Spark (SURVEY.md §3.1-3.2 "Spark shape", M5).
  *
  * HNSW insertion is sequential by construction — each insert reads the
  * graph previous inserts built — so the distributed design is the standard
  * sharded-ANN one: partition the vectors into `numShards` disjoint shards,
  * build an exact reference-semantics [[HnswIndex]] *per shard* inside
  * `mapPartitions` (no driver involvement, no shuffle beyond the initial
  * repartition), and serve a batch of queries by searching every shard and
  * merging per-query results (union + top-k, SURVEY.md D1). Per-shard
  * seeds derive from (seed, shard) so the whole build is deterministic
  * under a fixed shard count.
  *
  * The index artifact is *tables*, not a mutable object: an edge table
  * (shard, layer, src, dst), a vector table (shard, id, vec) and an entry
  * table (shard, ep, height) — the reference's in-place graph mutation
  * (py/hnsw.py:348, 377-387) becomes immutable table-in/table-out.
  * At 100 TB the vector table is the big one; it stays partitioned by
  * shard, each executor holding only its shard's slice, while queries fan
  * out to the shards through the same cogroup (never through the driver).
  */
object DistributedHnsw {

  final case class Shards(
      numShards: Int,
      params: HnswParams,
      vectors: DataFrame, // shard int, id long, vec array<double>
      edges: DataFrame,   // shard int, layer int, src long, dst long
      entries: DataFrame, // shard int, ep long, height int
      codes: Option[DataFrame] = None, // shard int, id long, code array<short>
      /** Per-node drawn level (shard int, id long, level int) — build
        * metadata emitted by [[buildAssigned]]; None for parquet-loaded
        * artifacts (not persisted). Under
        * [[HnswParams.deterministicLevels]] this table is exactly the md5
        * coin formula over global ids, i.e. SQL-replayable.
        */
      levels: Option[DataFrame] = None,
      private[DistributedHnsw] val caches: Seq[DataFrame] = Nil
  ) {
    /** Release the build-time caches (the shard-partitioned vectors and the
      * shared edge/entry materialization). Call once the index is persisted
      * or no longer queried — a long-lived session (or a streaming sink
      * building per micro-batch) otherwise accumulates executor storage
      * without bound. Idempotent; [[DistributedHnsw.load]]-opened shards
      * are parquet-backed and hold no caches.
      */
    def unpersist(): Unit = caches.foreach(_.unpersist(blocking = false))
  }

  /** Build per-shard HNSW graphs. Rows are assigned to shards by
    * `id % numShards` (deterministic, data-independent) and inserted in
    * ascending-id order inside each shard, so a rebuild reproduces the
    * identical graph.
    */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      params: HnswParams,
      numShards: Int,
      seed: Long,
      compression: Option[VectorCompression] = None
  ): Shards =
    buildAssigned(
      df.select(
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec")
      ).withColumn("shard", pmod(col("id"), lit(numShards)).cast("int")),
      params, numShards, seed, compression)

  /** CLUSTER-sharded build (the SPANN/DiskANN-style layout): shards are
    * coarse k-means cells instead of hash buckets, so vectors that are
    * close live in the same shard and a query's true neighbors
    * concentrate in its few nearest shards — which is what makes
    * [[searchRouted]] sound. Hash sharding spreads neighbors uniformly
    * (every shard must be searched); cluster sharding buys the
    * nShards/nProbe fan-out cut at the cost of shard skew (the centroids
    * come from [[KMeans.fit]] or any fixed set; skew is observable via
    * ivf_cell_stats' occupancy view of the same assignment).
    */
  def buildClustered(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      params: HnswParams,
      shardCentroids: Array[Array[Double]],
      seed: Long,
      compression: Option[VectorCompression] = None
  ): Shards = {
    val spark = df.sparkSession
    buildAssigned(
      df.select(
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec")
      ).withColumn(
        "shard",
        KMeans.assignCol(spark, shardCentroids, col("vec")).cast("int")),
      params, shardCentroids.length, seed, compression)
  }

  private def buildAssigned(
      assigned: DataFrame, // (id long, vec array<double>, shard int)
      params: HnswParams,
      numShards: Int,
      seed: Long,
      compression: Option[VectorCompression]
  ): Shards = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val data = assigned.repartition(numShards, col("shard"))
    data.cache()

    val built = data
      .select(col("shard"), col("id"), col("vec"))
      .as[(Int, Long, Seq[Double])]
      .mapPartitions { it =>
        // a hash partition may carry several shard keys: bucket rows by
        // shard in ONE pass (toSeq.groupBy would hold the partition twice
        // at peak — once as the seq, once as the grouped copies), then
        // build one index per shard present
        val byShard = scala.collection.mutable.HashMap
          .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Seq[Double])]]
        it.foreach { case (s, id, v) =>
          byShard.getOrElseUpdate(
            s, scala.collection.mutable.ArrayBuffer.empty) += ((id, v))
        }
        byShard.iterator.flatMap { case (shard, rows) =>
          val sorted = rows.sortInPlace()(Ordering.by(_._1))
          val ids = sorted.map(_._1).toArray
          val index = new HnswIndex(params, seed + shard, compression)
          sorted.foreach { case (gid, v) =>
            // det mode: level coin keyed on the GLOBAL id + base seed, so
            // the level assignment is shard-layout-independent and replays
            // as one md5 expression in SQL (the kmeans_*_det discipline)
            val coin =
              if (params.deterministicLevels)
                KMeans.md5Coin(s"$gid:hnswlvl:$seed")
              else Double.NaN
            index.insert(v.toArray, coin)
          }
          val edges = index.graph.edgeIterator.map { case (l, src, dst) =>
            (shard, l, ids(src), ids(dst), -1L, -1)
          }
          val entry =
            Iterator((shard, -1, -1L, -1L, ids(index.entryPoint), index.height))
          val lvls = ids.indices.iterator.map { i =>
            (shard, -2, ids(i), index.levelOf(i).toLong, -1L, -1)
          }
          edges ++ entry ++ lvls
        }
      }
      .toDF("shard", "layer", "src", "dst", "ep", "height")
    built.cache()

    val edges = built
      .filter(col("layer") >= 0)
      .select(col("shard"), col("layer"), col("src"), col("dst"))
    val entries = built
      .filter(col("layer") === -1)
      .select(col("shard"), col("ep"), col("height"))
    val levels = built
      .filter(col("layer") === -2)
      .select(col("shard"), col("src").as("id"),
        col("dst").cast("int").as("level"))
    // compressed builds persist the CODES as a first-class index table —
    // the reference's own layout (py/hnsw.py:345-348 stores the encoded
    // vector in the index). Encoding happens here, exactly once per
    // vector; search serves from this table and never touches raw vectors
    val codes = compression.map { c =>
      val df = shardCodes(data, c)
      df.cache()
      df
    }
    Shards(numShards, params, data, edges, entries, codes,
      levels = Some(levels),
      caches = Seq(data, built) ++ codes.toSeq)
  }

  /** (shard, id, code) via a partition-batched kernel — one broadcast codec
    * reference per partition, each vector encoded exactly once (the generic
    * [[VectorCompression]] analog of
    * [[ProductQuantizer.encodePartitioned]]).
    */
  private def shardCodes(
      vectors: DataFrame, // shard int, id long, vec array<double>
      c: VectorCompression
  ): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(c)
    vectors
      .select(col("shard"), col("id"), col("vec"))
      .as[(Int, Long, Seq[Double])]
      .mapPartitions { it =>
        val codec = bc.value
        it.map { case (s, id, v) => (s, id, codec.encode(v.toArray)) }
      }
      .toDF("shard", "id", "code")
  }

  /** Persist the index artifact (vectors/edges/entries, shard-partitioned
    * parquet). With dynamic partition overwrite, writing a rebuilt subset
    * of shards replaces only those shards' files — the unit of incremental
    * maintenance.
    */
  def save(shards: Shards, path: String): Unit = {
    val spark = shards.vectors.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    shards.vectors.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/vectors")
    shards.edges.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/edges")
    shards.entries.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/entries")
    // ~M shorts per vector vs D doubles — the compressed artifact a user
    // indexing 10^9 vectors actually wants on disk
    shards.codes.foreach(_.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$path/codes"))
  }

  /** Load a persisted index artifact; the code table comes back when the
    * artifact was saved from a compressed build.
    */
  def load(
      spark: SparkSession,
      path: String,
      params: HnswParams,
      numShards: Int
  ): Shards = {
    val codesPath = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = codesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val codes =
      if (fs.exists(codesPath))
        Some(spark.read.parquet(s"$path/codes")
          .select(col("shard").cast("int").as("shard"), col("id"), col("code")))
      else None
    Shards(
      numShards,
      params,
      spark.read.parquet(s"$path/vectors")
        .select(col("shard").cast("int").as("shard"), col("id"), col("vec")),
      spark.read.parquet(s"$path/edges")
        .select(col("shard").cast("int").as("shard"), col("layer"),
          col("src"), col("dst")),
      spark.read.parquet(s"$path/entries")
        .select(col("shard").cast("int").as("shard"), col("ep"), col("height")),
      codes
    )
  }

  /** Batch search: every shard traverses its local graph for every query,
    * then a global per-query top-k merge. Returns
    * (query_id, neighbor_id, dist, rnk).
    *
    * Queries never pass through the driver: they fan out to each shard via
    * a flatMap replication and meet the shard's base table/edges/entry in
    * one 4-way cogroup, so a million-query batch is just another
    * distributed input (per-shard iteration spills through the cogroup
    * machinery rather than sitting in driver or broadcast memory).
    *
    * Compressed search cogroups the CODE table (persisted at build — ~M
    * shorts per vector instead of D doubles on the wire) and measures
    * asymmetric query-to-code distances; the raw vector table is not in
    * the lineage and nothing encodes inside the search tasks. A
    * compressed search over a raw-only artifact derives the code table
    * once, distributed, before the cogroup.
    */
  def search(
      shards: Shards,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      efSearch: Int = -1,
      compression: Option[VectorCompression] = None
  ): DataFrame = {
    val spark = shards.vectors.sparkSession
    import spark.implicits._
    val nShards = shards.numShards
    val queryRdd = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .rdd.flatMap { case (id, v) =>
        (0 until nShards).iterator.map(s => (s, (id, v)))
      }
    searchQueryRdd(shards, queryRdd, qidCol, k, efSearch, compression)
  }

  /** Operating-curve search: ONE shard cogroup (one adjacency rebuild,
    * one upper-layer descent per query) serving EVERY efSearch setting —
    * the per-ef work is only the layer-0 beam. A curve that calls
    * [[search]] per setting pays the searcher assembly and the
    * ef-independent descent × |efs| for identical routing (the r13
    * hnsw_ef_curve cost). Each ef slice is bit-equal to [[search]] at
    * that ef (spec-gated). Returns (ef, query_id, neighbor_id, dist,
    * rnk) with the same bounded-heap global top-k merge, keyed per
    * (ef, query).
    */
  def searchEfCurve(
      shards: Shards,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      efs: Seq[Int],
      compression: Option[VectorCompression] = None
  ): DataFrame = {
    val spark = shards.vectors.sparkSession
    import spark.implicits._
    val nShards = shards.numShards
    val params = shards.params
    val efArr = efs.toArray
    val queryRdd = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .rdd.flatMap { case (id, v) =>
        (0 until nShards).iterator.map(s => (s, (id, v)))
      }
    val edgeRdd = shards.edges
      .as[(Int, Int, Long, Long)]
      .rdd.map { case (s, l, a, b) => (s, (l, a, b)) }
    val entryRdd = shards.entries
      .as[(Int, Long, Int)]
      .rdd.map { case (s, ep, h) => (s, (ep, h)) }
    val raw = (compression match {
      case Some(c) =>
        val codeRdd = shards.codes.getOrElse(shardCodes(shards.vectors, c))
          .select(col("shard"), col("id"), col("code"))
          .as[(Int, Long, Seq[Short])]
          .rdd.map { case (s, id, cd) => (s, (id, cd)) }
        searchShardsMulti[Seq[Short]](
          codeRdd, edgeRdd, entryRdd, queryRdd, k, efArr,
          (codes, height) => LocalGraphSearcher.compressed(
            codes.map(_.toArray), height, params, c)
        )
      case None =>
        val vecRdd = shards.vectors
          .select(col("shard"), col("id"), col("vec"))
          .as[(Int, Long, Seq[Double])]
          .rdd.map { case (s, id, v) => (s, (id, v)) }
        searchShardsMulti[Seq[Double]](
          vecRdd, edgeRdd, entryRdd, queryRdd, k, efArr,
          (vecs, height) => LocalGraphSearcher.raw(
            vecs.map(_.toArray), height, params)
        )
    }).toDF("ef", "query_id", "neighbor_id", "dist")
    raw
      .groupBy(col("ef"), col("query_id"))
      .agg(topK(col("dist"), col("neighbor_id"), k).as("tk"))
      .select(col("ef"), col("query_id"),
        posexplode(col("tk")).as(Seq("pos", "e")))
      .select(
        col("ef").cast("long").as("ef"),
        col("query_id").as(qidCol),
        col("e.id").as("neighbor_id"),
        col("e.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk")
      )
  }

  /** Routed search over a [[buildClustered]] index: each query visits
    * only its `nProbeShards` nearest shards (by shard centroid — the same
    * probe selection as [[IvfIndex.probeCells]]), cutting per-query work
    * by nShards/nProbeShards. With `nProbeShards = numShards` this
    * degrades to [[search]] exactly (spec-gated); recall under partial
    * probing is gated like every approximate path. The probe stage costs
    * |Q|·nShards centroid distances — the IVF probe economics, reused.
    */
  def searchRouted(
      shards: Shards,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      shardCentroids: Array[Array[Double]],
      nProbeShards: Int,
      efSearch: Int = -1,
      compression: Option[VectorCompression] = None
  ): DataFrame = {
    val spark = shards.vectors.sparkSession
    import spark.implicits._
    val queryRdd = IvfIndex
      .probeCells(spark, queries, qidCol, qvecCol, shardCentroids, nProbeShards)
      .select(
        col("cell"),
        col(qidCol).cast("long"),
        col(qvecCol).cast("array<double>"))
      .as[(Int, Long, Seq[Double])]
      .rdd.map { case (s, id, v) => (s, (id, v)) }
    searchQueryRdd(shards, queryRdd, qidCol, k, efSearch, compression)
  }

  /** Search kernel shared by the fan-out and routed paths: co-locate base
    * table / edges / entry / the (shard, query) pairs per shard, rebuild a
    * local index (graph replay — no random level draws, so exactly the
    * built graph), merge per-query.
    */
  private def searchQueryRdd(
      shards: Shards,
      queryRdd: org.apache.spark.rdd.RDD[(Int, (Long, Seq[Double]))],
      qidCol: String,
      k: Int,
      efSearch: Int,
      compression: Option[VectorCompression]
  ): DataFrame = {
    val spark = shards.vectors.sparkSession
    import spark.implicits._
    val params = shards.params

    val edgeRdd = shards.edges
      .as[(Int, Int, Long, Long)]
      .rdd.map { case (s, l, a, b) => (s, (l, a, b)) }
    val entryRdd = shards.entries
      .as[(Int, Long, Int)]
      .rdd.map { case (s, ep, h) => (s, (ep, h)) }

    val results = (compression match {
      case Some(c) =>
        val codeRdd = shards.codes.getOrElse(shardCodes(shards.vectors, c))
          .select(col("shard"), col("id"), col("code"))
          .as[(Int, Long, Seq[Short])]
          .rdd.map { case (s, id, cd) => (s, (id, cd)) }
        searchShards[Seq[Short]](
          codeRdd, edgeRdd, entryRdd, queryRdd, k, efSearch,
          (codes, height) => LocalGraphSearcher.compressed(
            codes.map(_.toArray), height, params, c)
        )
      case None =>
        val vecRdd = shards.vectors
          .select(col("shard"), col("id"), col("vec"))
          .as[(Int, Long, Seq[Double])]
          .rdd.map { case (s, id, v) => (s, (id, v)) }
        searchShards[Seq[Double]](
          vecRdd, edgeRdd, entryRdd, queryRdd, k, efSearch,
          (vecs, height) => LocalGraphSearcher.raw(
            vecs.map(_.toArray), height, params)
        )
    }).toDF("query_id", "neighbor_id", "dist")

    // global merge: bounded-heap top-k per query (partial agg per shard
    // output partition, O(|Q|*k) shuffle)
    results
      .groupBy(col("query_id"))
      .agg(topK(col("dist"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(
        col("query_id").as(qidCol),
        col("e.id").as("neighbor_id"),
        col("e.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk")
      )
  }

  /** Attribute-filtered batch search (the graph half of the filtered-ANN
    * story — [[IvfIndex.searchPartitionedWith]]'s `baseFilter` is the
    * inverted-file half): `allowedIds` (one numeric id column — typically
    * a predicate over a metadata table) flags each shard vector, the
    * layer-0 traversal routes through disallowed nodes but only surfaces
    * flagged ones. The flag rides the same shard-cogroup as the vectors —
    * one extra boolean per row, no extra shuffle of the corpus, and the
    * allow-set is never collected anywhere.
    *
    * Under a selective predicate raise `efSearch` (the standard
    * over-fetch) — recall is spec-gated; with every id allowed the result
    * is bit-identical to [[search]].
    */
  def searchFiltered(
      shards: Shards,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      allowedIds: DataFrame,
      efSearch: Int = -1
  ): DataFrame =
    searchFlagged(
      shards, queries, qidCol, qvecCol, k,
      shards.vectors
        .join(
          allowedIds
            .select(col(allowedIds.columns.head).cast("long").as("id"))
            .distinct()
            .withColumn("ok", lit(true)),
          Seq("id"), "left")
        .select(
          col("shard"), col("id"), col("vec"),
          coalesce(col("ok"), lit(false)).as("ok")),
      efSearch)

  /** Tombstone-excluding search — the DELETE half of index maintenance
    * without touching the graph: deleted ids stay as routable waypoints in
    * the traversal (removing their edges would sever paths and crater
    * recall) but can never surface in results. The flag is the INVERSE of
    * [[searchFiltered]]'s allow-list, built by one left join of the base
    * table against the tombstone set — when deletes are sparse (the
    * steady state between compactions) that ships |tombstones| rows, not
    * an N-row allow materialization. With an empty tombstone set the plan
    * degenerates to [[search]]'s results bit-for-bit (spec-gated); as the
    * tombstone fraction grows, raise `efSearch` (the standard over-fetch)
    * until [[compact]] rewrites the affected shards.
    */
  def searchWithTombstones(
      shards: Shards,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      tombstones: DataFrame,
      efSearch: Int = -1
  ): DataFrame =
    searchFlagged(
      shards, queries, qidCol, qvecCol, k,
      shards.vectors
        .join(
          tombstones
            .select(col(tombstones.columns.head).cast("long").as("id"))
            .distinct()
            .withColumn("dead", lit(true)),
          Seq("id"), "left")
        .select(
          col("shard"), col("id"), col("vec"),
          col("dead").isNull.as("ok")),
      efSearch)

  private def searchFlagged(
      shards: Shards,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      flagged: DataFrame, // shard int, id long, vec array<double>, ok boolean
      efSearch: Int
  ): DataFrame = {
    val spark = shards.vectors.sparkSession
    import spark.implicits._
    val params = shards.params
    val nShards = shards.numShards

    val baseRdd = flagged
      .as[(Int, Long, Seq[Double], Boolean)]
      .rdd.map { case (s, id, v, ok) => (s, (id, (v, ok))) }
    val edgeRdd = shards.edges
      .as[(Int, Int, Long, Long)]
      .rdd.map { case (s, l, a, b) => (s, (l, a, b)) }
    val entryRdd = shards.entries
      .as[(Int, Long, Int)]
      .rdd.map { case (s, ep, h) => (s, (ep, h)) }
    val queryRdd = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .rdd.flatMap { case (id, v) =>
        (0 until nShards).iterator.map(s => (s, (id, v)))
      }
    val results = searchShards[(Seq[Double], Boolean)](
      baseRdd, edgeRdd, entryRdd, queryRdd, k, efSearch,
      (payload, height) => LocalGraphSearcher.rawFiltered(
        payload.map(_._1.toArray), payload.map(_._2), height, params)
    ).toDF("query_id", "neighbor_id", "dist")

    results
      .groupBy(col("query_id"))
      .agg(topK(col("dist"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(
        col("query_id").as(qidCol),
        col("e.id").as("neighbor_id"),
        col("e.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk")
      )
  }

  /** Shard-scoped compaction — the physical half of delete maintenance:
    * tombstoned vectors are removed by REBUILDING ONLY the shards that
    * contain them; every other shard's graph, entry, and codes pass
    * through untouched (and with [[save]]'s dynamic partition overwrite,
    * unaffected shards' files are never rewritten). The affected-shard
    * set is a ≤ numShards-row collect, not a data collect. Deleting d
    * ids spread over s shards costs s shard rebuilds — O(corpus/numShards
    * · s) — independent of total index size, which is what makes
    * periodic compaction viable at 10^9 vectors.
    *
    * A compressed index must pass its codec so the rebuilt shards'
    * code tables are re-derived; surviving shards keep their persisted
    * codes.
    */
  def compact(
      shards: Shards,
      tombstones: DataFrame,
      seed: Long,
      compression: Option[VectorCompression] = None
  ): Shards = {
    require(
      shards.codes.isEmpty || compression.isDefined,
      "compacting a compressed index requires its codec (codes must be re-derived for rebuilt shards)")
    require(
      shards.codes.isDefined || compression.isEmpty,
      "compacting an uncompressed index with a codec would produce codes for the rebuilt shards only " +
        "(untouched shards would silently vanish from compressed search) — build/encode the full index first")
    val tomb = tombstones
      .select(col(tombstones.columns.head).cast("long").as("id"))
      .distinct()
    val affected = shards.vectors
      .join(tomb, Seq("id"), "left_semi")
      .select(col("shard")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (affected.isEmpty) return shards
    val survivors = shards.vectors.join(tomb, Seq("id"), "left_anti")
    val rebuilt = buildAssigned(
      survivors
        .filter(col("shard").isin(affected: _*))
        .select(col("id"), col("vec"), col("shard")),
      shards.params, shards.numShards, seed, compression)
    def keep(df: DataFrame): DataFrame =
      df.filter(!col("shard").isin(affected: _*))
    Shards(
      shards.numShards,
      shards.params,
      vectors = keep(shards.vectors).unionByName(rebuilt.vectors),
      edges = keep(shards.edges).unionByName(rebuilt.edges),
      entries = keep(shards.entries).unionByName(rebuilt.entries),
      codes = (shards.codes, rebuilt.codes) match {
        case (Some(o), Some(n)) => Some(keep(o).unionByName(n))
        case (None, n)          => n
        case (o, None)          => o.map(keep)
      },
      levels = (shards.levels, rebuilt.levels) match {
        case (Some(o), Some(n)) => Some(keep(o).unionByName(n))
        // A parquet-loaded index has no levels table; emitting only the
        // rebuilt shards' levels would let a downstream census silently
        // read a partial table as complete — absent beats partial.
        case (None, _)          => None
        case (o, None)          => o.map(keep)
      },
      caches = rebuilt.caches
    )
  }

  /** The shard-cogroup search kernel, generic over the per-node payload
    * (raw vectors or codes): replay the shard's edge table into a local
    * searcher, run every query of the shard's query slice through it.
    */
  private def searchShards[V: scala.reflect.ClassTag](
      base: org.apache.spark.rdd.RDD[(Int, (Long, V))],
      edges: org.apache.spark.rdd.RDD[(Int, (Int, Long, Long))],
      entries: org.apache.spark.rdd.RDD[(Int, (Long, Int))],
      queries: org.apache.spark.rdd.RDD[(Int, (Long, Seq[Double]))],
      k: Int,
      efSearch: Int,
      mkSearcher: (Array[V], Int) => LocalGraphSearcher
  ): org.apache.spark.rdd.RDD[(Long, Long, Double)] =
    base.cogroup(edges, entries, queries)
      .flatMap { case (_, (nodes, es, ens, qs)) =>
        if (nodes.isEmpty || ens.isEmpty || qs.isEmpty) Iterator.empty
        else {
          val sorted = nodes.toArray.sortBy(_._1)
          val ids = sorted.map(_._1)
          val localOf = ids.zipWithIndex.toMap
          val (ep, height) = ens.head
          val searcher = mkSearcher(sorted.map(_._2), height)
          es.foreach { case (l, a, b) =>
            searcher.addEdge(l, localOf(a), localOf(b))
          }
          searcher.setEntry(localOf(ep))
          qs.iterator.flatMap { case (qid, qv) =>
            searcher.search(qv.toArray, k, efSearch).map { case (d, local) =>
              (qid, ids(local), d)
            }
          }
        }
      }

  /** [[searchShards]] for a whole ef curve: identical shard assembly (one
    * sort, one adjacency rebuild), one descent per query shared across
    * every ef via [[LocalGraphSearcher.searchMulti]]. */
  private def searchShardsMulti[V: scala.reflect.ClassTag](
      base: org.apache.spark.rdd.RDD[(Int, (Long, V))],
      edges: org.apache.spark.rdd.RDD[(Int, (Int, Long, Long))],
      entries: org.apache.spark.rdd.RDD[(Int, (Long, Int))],
      queries: org.apache.spark.rdd.RDD[(Int, (Long, Seq[Double]))],
      k: Int,
      efs: Array[Int],
      mkSearcher: (Array[V], Int) => LocalGraphSearcher
  ): org.apache.spark.rdd.RDD[(Int, Long, Long, Double)] =
    base.cogroup(edges, entries, queries)
      .flatMap { case (_, (nodes, es, ens, qs)) =>
        if (nodes.isEmpty || ens.isEmpty || qs.isEmpty) Iterator.empty
        else {
          val sorted = nodes.toArray.sortBy(_._1)
          val ids = sorted.map(_._1)
          val localOf = ids.zipWithIndex.toMap
          val (ep, height) = ens.head
          val searcher = mkSearcher(sorted.map(_._2), height)
          es.foreach { case (l, a, b) =>
            searcher.addEdge(l, localOf(a), localOf(b))
          }
          searcher.setEntry(localOf(ep))
          qs.iterator.flatMap { case (qid, qv) =>
            searcher.searchMulti(qv.toArray, k, efs).map { case (e, d, local) =>
              (e, qid, ids(local), d)
            }
          }
        }
      }
}

/** Read-only shard searcher: the [[HnswIndex]] search path over a replayed
  * edge table (adjacency arrays, no build machinery). Distance evaluation
  * is injected — raw L2² over vectors, or asymmetric query-to-code over a
  * persisted code table (nothing encodes at search time).
  */
final class LocalGraphSearcher private (
    n: Int,
    height: Int,
    params: HnswParams,
    distQ: (Array[Double], Int) => Double,
    allow: Int => Boolean = null
) {
  import scala.collection.mutable

  private val adj =
    Array.fill(height)(mutable.HashMap.empty[Int, mutable.HashSet[Int]])
  private var entry = 0

  def addEdge(l: Int, a: Int, b: Int): Unit =
    adj(l).getOrElseUpdate(a, mutable.HashSet.empty) += b

  def setEntry(e: Int): Unit = entry = e

  private def searchLayer(
      q: Array[Double],
      ep: Int,
      ef: Int,
      layer: Int
  ): IndexedSeq[(Double, Int)] =
    HnswTraversal.searchLayer(
      distQ(q, _), adj(layer).getOrElse(_, Iterable.empty), ep, ef
    )

  def search(
      q: Array[Double],
      topK: Int,
      efSearch: Int = -1
  ): IndexedSeq[(Double, Int)] = {
    if (n == 0) return IndexedSeq.empty
    val ef = math.max(if (efSearch > 0) efSearch else params.efSearch, topK)
    var ep = entry
    var lc = height - 1
    // upper layers route only (their result never enters W) — descent is
    // unfiltered even in a filtered search, the hnswlib semantics
    while (lc > 0) {
      ep = searchLayer(q, ep, 1, lc).head._2
      lc -= 1
    }
    if (allow == null) searchLayer(q, ep, ef, 0).take(topK)
    else
      HnswTraversal.searchLayerFiltered(
        distQ(q, _), adj(0).getOrElse(_, Iterable.empty), ep, ef, allow
      ).take(topK)
  }

  /** Multi-ef search sharing the ef-INDEPENDENT work: the upper-layer
    * greedy descent routes with ef=1 regardless of efSearch, so an
    * operating curve that re-descends per setting pays |layers| greedy
    * walks × |efs| for identical routing. One descent, then one layer-0
    * beam per ef — each (ef, result) is bit-equal to [[search]] at that
    * ef (spec-gated). Returns (ef, dist, localId) triples.
    */
  def searchMulti(
      q: Array[Double],
      topK: Int,
      efs: Array[Int]
  ): Iterator[(Int, Double, Int)] = {
    if (n == 0) return Iterator.empty
    var ep = entry
    var lc = height - 1
    while (lc > 0) {
      ep = searchLayer(q, ep, 1, lc).head._2
      lc -= 1
    }
    val ep0 = ep
    efs.iterator.flatMap { e =>
      val ef = math.max(if (e > 0) e else params.efSearch, topK)
      val res =
        if (allow == null) searchLayer(q, ep0, ef, 0).take(topK)
        else
          HnswTraversal.searchLayerFiltered(
            distQ(q, _), adj(0).getOrElse(_, Iterable.empty), ep0, ef, allow
          ).take(topK)
      res.iterator.map { case (d, local) => (e, d, local) }
    }
  }
}

object LocalGraphSearcher {

  /** Uncompressed: exact L2² against the shard's raw vectors. */
  def raw(
      vecs: Array[Array[Double]],
      height: Int,
      params: HnswParams
  ): LocalGraphSearcher =
    new LocalGraphSearcher(
      vecs.length, height, params,
      (q, id) => KMeansLocal.l2Sq(q, vecs(id)))

  /** Attribute-filtered: exact L2² plus a per-node admission flag. The
    * walk routes through disallowed nodes; only flagged nodes surface.
    */
  def rawFiltered(
      vecs: Array[Array[Double]],
      flags: Array[Boolean],
      height: Int,
      params: HnswParams
  ): LocalGraphSearcher =
    new LocalGraphSearcher(
      vecs.length, height, params,
      (q, id) => KMeansLocal.l2Sq(q, vecs(id)),
      allow = flags(_))

  /** Compressed: asymmetric query-to-code distance over the shard's
    * PERSISTED codes (ref py/hnsw.py:184-189 — search compares raw query
    * to stored codes; it never re-encodes the corpus).
    */
  def compressed(
      codes: Array[Array[Short]],
      height: Int,
      params: HnswParams,
      c: VectorCompression
  ): LocalGraphSearcher =
    new LocalGraphSearcher(
      codes.length, height, params,
      (q, id) => c.queryDistance(q, codes(id)))
}
