package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN (Ester et al. 1996) over an embedding column, made canonical
  * and therefore engine-portable: classic DBSCAN's border-point
  * assignment is visit-order-dependent — a border point in eps-range of
  * two clusters joins whichever was expanded first. Here every
  * order-dependent choice is replaced by a deterministic min rule, so the
  * labeling is a pure function of the data:
  *
  *   - core point:  |N_eps(p)| >= minPts (self included, the paper's
  *     counting convention);
  *   - cluster id:  the MIN core id reachable through core-core
  *     eps-edges (density-connectivity restricted to cores is an
  *     equivalence relation, so this is the standard unique partition of
  *     the cores);
  *   - border:      non-core within eps of >= 1 core — assigned the MIN
  *     cluster id among its core neighbors (the only deviation from
  *     visit-order DBSCAN, and the only place visit-order DBSCAN is
  *     itself ambiguous);
  *   - noise:       everything else, cluster = -1.
  *
  * Spark shape: the eps-neighbor pair table comes from the same triangle
  * block-pair join as [[Dedup.embeddingPairs]] (shuffle = numBlocks·n
  * rows, per-task memory = two blocks, the O(n²/2) distance work spread
  * evenly, no corpus broadcast) — exact all-pairs is inherent to exact
  * DBSCAN. Everything after the pair table is linear: one degree
  * aggregation, connected components over CORE-core edges only (the
  * size-adaptive [[Dedup.connectedComponents]] — driver union-find on
  * small graphs, double-pointer-jumping at scale), and one min-aggregate
  * border attach. For corpora where exact pair enumeration is too big,
  * feed [[dbscanFromPairs]] an approximate pair table (e.g. the
  * [[Dedup.embeddingPairsLsh]] candidates verified at eps) — the
  * labeling stages are pair-source-agnostic.
  */
object Dbscan {

  /** Exact eps-neighbor pairs (id_a < id_b, L2² <= eps2) via the
    * triangle block-pair join. Distances accumulate left-to-right in
    * array order, bit-identical to [[graft.functions.L2SqExpr]] and the
    * DuckDB `list_sum(list_transform(...))` spelling.
    */
  def epsNeighborPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps2: Double,
      numBlocks: Int = 16
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sides = df
      .select(
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"),
        pmod(Dedup.md5Long(col(idCol).cast("string")), lit(numBlocks))
          .cast("int").as("blk")
      )
      .select(
        explode(expr(
          s"transform(sequence(0, ${numBlocks - 1}), k -> " +
            "struct(least(blk, k) AS pi, greatest(blk, k) AS pj, " +
            "blk <= k AS lft))"
        )).as("p"),
        col("id"), col("v")
      )
      .select(col("p.pi"), col("p.pj"), col("p.lft"), col("id"), col("v"))
      .as[Dedup.BlockSide]
    sides
      .groupByKey(r => (r.pi, r.pj))
      .flatMapGroups { (key: (Int, Int), it: Iterator[Dedup.BlockSide]) =>
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        it.foreach { r =>
          val e = (r.id, r.v)
          if (r.lft) left += e else right += e
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        def emit(a: (Long, Array[Double]), b: (Long, Array[Double])): Unit = {
          val n = math.min(a._2.length, b._2.length)
          var s = 0.0
          var i = 0
          while (i < n) { val x = a._2(i) - b._2(i); s += x * x; i += 1 }
          if (s <= eps2)
            out += (if (a._1 < b._1) (a._1, b._1) else (b._1, a._1))
        }
        if (key._1 == key._2) {
          var i = 0
          while (i < left.length) {
            var j = i + 1
            while (j < left.length) { emit(left(i), left(j)); j += 1 }
            i += 1
          }
        } else {
          var i = 0
          while (i < left.length) {
            var j = 0
            while (j < right.length) { emit(left(i), right(j)); j += 1 }
            i += 1
          }
        }
        out.iterator
      }
      .toDF("id_a", "id_b")
  }

  /** APPROXIMATE eps-neighbor pairs for the corpus-scale path: SRP
    * band-collision candidates ([[Dedup.srpCandidates]] — sub-quadratic,
    * collision-driven volume instead of n²/blocks) verified with the
    * exact codegen L2² <= eps2. Surviving pairs are exact; RECALL is
    * blocking-dependent (an eps-pair outside every band is never
    * examined — SRP bands block on angle, which correlates with but
    * does not equal the eps-ball), so densities are under-counted near
    * the blocking boundary: the standard approximate-DBSCAN trade,
    * feed to [[dbscanFromPairs]].
    */
  def epsNeighborPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps2: Double,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = -1
  ): DataFrame = {
    import graft.functions.VectorExpressions.l2SqFast
    val e = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    Dedup.srpCandidates(df, idCol, vecCol, numPlanes, bands, dim)
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .join(e.select(col("id").as("doc_a"), col("v").as("va")), "doc_a")
      .join(e.select(col("id").as("doc_b"), col("v").as("vb")), "doc_b")
      .filter(l2SqFast(col("va"), col("vb")) <= eps2)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
  }

  /** Canonical DBSCAN labeling. Returns one row per input row:
    * (idCol, role in {'core','border','noise'}, cluster long; -1 = noise).
    */
  def dbscan(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps2: Double,
      minPts: Int,
      numBlocks: Int = 16
  ): DataFrame =
    dbscanFromPairs(
      df, idCol,
      epsNeighborPairs(df, idCol, vecCol, eps2, numBlocks), minPts)

  /** The labeling stages over any (id_a, id_b) eps-pair table — exact or
    * approximate. Pair table is evaluated once (localCheckpoint): three
    * consumers (degree, core-edge filter, border attach) would otherwise
    * re-run the blocked join.
    */
  def dbscanFromPairs(
      df: DataFrame,
      idCol: String,
      pairsIn: DataFrame,
      minPts: Int
  ): DataFrame = {
    val idType = df.schema(idCol).dataType
    val pairs = pairsIn
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .localCheckpoint()
    val und = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val ids = df.select(col(idCol).cast("long").as("id"))
    val deg = ids
      .join(und.groupBy(col("id")).agg(count(lit(1)).as("nnb")), Seq("id"), "left")
      .select(col("id"), (coalesce(col("nnb"), lit(0L)) + 1).as("deg"))
    val core = deg.filter(col("deg") >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("id_a")), "id_a", "left_semi")
      .join(core.select(col("id").as("id_b")), "id_b", "left_semi")
    val comp = Dedup.connectedComponents(coreEdges, "id_a", "id_b")
    val coreClusters = core
      .join(comp.select(col("doc_id").as("id"), col("rep_id")), Seq("id"), "left")
      .select(col("id"), coalesce(col("rep_id"), col("id")).as("cluster"))
    val borderClusters = und
      .join(core.select(col("id")), Seq("id"), "left_anti")
      .join(coreClusters.select(col("id").as("nb"), col("cluster")), "nb")
      .groupBy(col("id"))
      .agg(min(col("cluster")).as("cluster"))
    ids
      .join(coreClusters.select(col("id"), col("cluster").as("cc")), Seq("id"), "left")
      .join(borderClusters.select(col("id"), col("cluster").as("bc")), Seq("id"), "left")
      .select(
        col("id").cast(idType).as(idCol),
        when(col("cc").isNotNull, lit("core"))
          .when(col("bc").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("cc"), col("bc"), lit(-1L)).as("cluster")
      )
  }
}
