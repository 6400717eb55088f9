package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PageRank over a neighbor graph (Page et al. 1999) — the centrality
  * signal for graph-based data selection: documents/vectors that many
  * near-neighbors point at are "representative" of dense regions, the
  * complement of the k-center geometric coverage pick. Synchronous
  * power iteration with damping d:
  *
  *   pr₀(v) = 1/N;  pr_{r+1}(v) = (1−d)/N + d·(Σ_{u→v} pr_r(u)/outdeg(u)
  *                                             + Dm_r·tp(v)/(Σtp))
  *
  * over the UNDIRECTED neighbor edge set (each edge contributes both
  * ways). Mass on DANGLING nodes (isolated — no edges at all after
  * undirecting) is redistributed along the teleport distribution each
  * round, the textbook convention: Dm_r = Σ pr_r over dangling nodes
  * (decimal-exact), landing uniformly for global PageRank and on the
  * seed set for personalized — so total mass is conserved at 1. On a
  * graph with no isolated nodes Dm = 0.0 exactly and every float is
  * bit-identical to the plain power iteration.
  *
  * Engine-portable by construction: per-edge contributions pr/outdeg
  * are identical IEEE divisions on both engines, and each round's
  * per-node accumulation routes through DECIMAL(38,20) — exact, so
  * partial-aggregation order can't perturb the next round's inputs.
  * The whole fixed-round schedule replays as unrolled SQL rounds.
  *
  * Scale per round: one edge⋈rank equi-join (shuffle keyed on the
  * node id, volume |E|), one decimal aggregate, one left join back to
  * the node universe — linear in edges; rank state is one row per
  * node, localCheckpoint-truncated.
  */
object PageRank {

  def pageRank(
      edges: DataFrame, // directed (src, dst) — undirected internally
      ids: DataFrame, // one row per node id in the universe
      rounds: Int,
      damping: Double = 0.85
  ): DataFrame = pageRankImpl(edges, ids, None, rounds, damping)

  /** Personalized PageRank — the teleport mass lands ONLY on `seeds`
    * (uniformly), so ranks measure proximity to the seed set through
    * the graph: the graph-walk complement of DSIR's n-gram importance
    * ("find more data like this curated slice", Haveliwala 2002).
    * Same arithmetic discipline as [[pageRank]]; pr₀ = 1/|S| on seeds,
    * 0 elsewhere.
    */
  def personalizedPageRank(
      edges: DataFrame,
      ids: DataFrame,
      seeds: DataFrame, // one row per seed id
      rounds: Int,
      damping: Double = 0.85
  ): DataFrame = pageRankImpl(edges, ids, Some(seeds), rounds, damping)

  private def pageRankImpl(
      edges: DataFrame,
      ids: DataFrame,
      seedsOpt: Option[DataFrame],
      rounds: Int,
      damping: Double
  ): DataFrame = {
    require(rounds >= 1, s"pageRank needs >= 1 round, got $rounds")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint() // reused by the degree table + every round
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val nodes = ids.select(col("id").cast("long").as("id")).localCheckpoint()
    // teleport column: (1−d)/N everywhere (global), or (1−d)/|S| on the
    // seed set and 0 elsewhere (personalized); pr₀ uses d = 0's shape
    val (base, tele) = seedsOpt match {
      case None =>
        val n = nodes.count()
        (nodes.withColumn("tp", lit(1.0) / n), lit(1.0 - damping) / n)
      case Some(seeds) =>
        val s = seeds.select(col("id").cast("long").as("id")).distinct()
          .localCheckpoint()
        val ns = s.count()
        require(ns > 0, "personalized PageRank needs a non-empty seed set")
        val tagged = nodes
          .join(s.withColumn("isSeed", lit(true)), Seq("id"), "left")
          .withColumn("tp",
            when(col("isSeed"), lit(1.0) / ns).otherwise(lit(0.0)))
          .select(col("id"), col("tp"))
        (tagged, when(col("tp") > 0, lit(1.0 - damping) / ns).otherwise(lit(0.0)))
    }
    val anchored = base.localCheckpoint()
    var pr = anchored.select(col("id"), col("tp").as("pr")).localCheckpoint()
    var r = 0
    while (r < rounds) {
      val contrib = und
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(deg.select(col("id").as("src"), col("deg")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum((col("pr") / col("deg")).cast(DecimalType(38, 20)))
          .cast("double").as("s"))
      // dangling mass: pr on nodes with no out-edge, re-entering along
      // the teleport distribution (Σtp = 1 by construction, so the
      // per-node share is Dm·tp); decimal-exact sum, broadcast scalar —
      // exactly 0.0 (and float-invisible) when no node is isolated
      val dang = pr
        .join(deg.select(col("id")), Seq("id"), "left_anti")
        .agg(coalesce(
          sum(col("pr").cast(DecimalType(38, 20))).cast("double"),
          lit(0.0)).as("dm"))
      pr = anchored
        .join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select(
          col("id"),
          (tele + lit(damping) *
            (coalesce(col("s"), lit(0.0)) + col("dm") * col("tp"))).as("pr"))
        .localCheckpoint()
      r += 1
    }
    pr
  }
}
