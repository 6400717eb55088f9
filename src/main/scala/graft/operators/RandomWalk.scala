package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-walk corpus generation over a (kNN) graph — the training-data
  * side of graph embeddings: DeepWalk's first-order uniform walks
  * (Perozzi et al., KDD 2014), node2vec's p/q-biased second-order walks
  * (Grover & Leskovec, KDD 2016), and the skip-gram (center, context)
  * pair stream with negative sampling (Mikolov et al., NIPS 2013) that
  * turns walks into embedding-training rows.
  *
  * Determinism discipline: every draw is the engine's md5 coin
  * ([[Dedup.md5Long]]) over (walk id, step) — no JVM RNG — and every
  * pick is INTEGER arithmetic (`coin % deg`, `coin % totalWeight`), so
  * the full walk trajectory replays exactly as unrolled SQL and the
  * queries are hash-checked, the kmeans_*_det discipline.
  *
  * Scale shape: one ranked-adjacency table (a single window over the
  * edge list, same key as its groupBy), then one equi-join per step of
  * frontier ⋈ adjacency on the current node — the [[PageRank]] round
  * pattern, including its localCheckpoint lineage truncation per round.
  * Frontier size = number of walks (constant across steps); nothing
  * collects to the driver. The skip-gram self-join is keyed on walk_id
  * with ≤ (L+1)² pairs per walk, and negatives are map-side coin draws
  * joined to the rank→id table.
  */
object RandomWalk {

  /** Undirected distinct adjacency keyed for the step join: per current
    * node `cur`, neighbors `dst` with contiguous rank rn ∈ 1..deg
    * (ordered by dst) and the degree.
    */
  private def rankedAdjacency(edges: DataFrame): DataFrame =
    edges
      .select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy("src").orderBy("dst")))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .select(col("src").as("cur"), col("dst"), col("rn"), col("deg"))
      .localCheckpoint() // reused by every step join

  private def coin(parts: Column*): Column =
    Dedup.md5Long(concat_ws(":", parts: _*))

  /** First-order uniform walks (DeepWalk). `starts` supplies one row per
    * walk (walk_id = start node id); step t picks the neighbor with
    * rank = coin("wk", salt, walk, t) % deg + 1. Returns
    * (walk_id, step, id) with step 0 = the start node. A walk ends early
    * only at a sink (a node absent from the undirected edge list —
    * impossible on a kNN graph, where out-degree ≥ k).
    */
  def uniformWalks(
      edges: DataFrame,
      starts: DataFrame, // one column: the start node id
      steps: Int,
      salt: String
  ): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val adj = rankedAdjacency(edges)
    var frontier = starts
      .select(col(starts.columns.head).cast("long").as("walk_id"))
      .withColumn("cur", col("walk_id"))
      .localCheckpoint()
    val out = Seq.newBuilder[DataFrame]
    out += frontier.select(
      col("walk_id"), lit(0).as("step"), col("cur").as("id"))
    for (t <- 1 to steps) {
      frontier = frontier
        .join(adj, Seq("cur"))
        .filter(col("rn") ===
          coin(lit("wk"), lit(salt), col("walk_id"), lit(t)) % col("deg") + 1)
        .select(col("walk_id"), col("dst").as("cur"))
        .localCheckpoint()
      out += frontier.select(
        col("walk_id"), lit(t).as("step"), col("cur").as("id"))
    }
    out.result().reduce(_.unionByName(_))
  }

  /** Distance-weighted first-order walks: transition probability ∝ an
    * INTEGER weight w = round(10⁶ / (1 + dist)) per undirected edge, so
    * closer neighbors are proportionally likelier — the
    * similarity-biased corpus (node2vec's α = dist-aware edge weights,
    * Grover & Leskovec §3.2.1) — while the cumulative-weight pick stays
    * exact integer arithmetic (coin % Σw lands in a neighbor's
    * [cum−w, cum) slot). `edges` must carry (src, dst, dist); dist is
    * symmetric so the undirected union is weight-consistent.
    */
  def weightedWalks(
      edges: DataFrame, // (src, dst, dist)
      starts: DataFrame,
      steps: Int,
      salt: String
  ): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val adj = edges
      .select(col("src"), col("dst"), col("dist"))
      .unionAll(edges.select(
        col("dst").as("src"), col("src").as("dst"), col("dist")))
      .distinct()
      .withColumn("w",
        // clamp to >= 1: a dist >= ~2e6 would round to 0, and a node whose
        // every edge rounds to 0 gives tot = 0 -> coin % 0 = NULL -> the
        // walk silently truncates, breaking the "ends only at a sink"
        // contract
        greatest(
          round(lit(1000000.0) / (lit(1.0) + col("dist")), 0).cast("long"),
          lit(1L)))
      .select(col("src").as("cur"), col("dst"), col("w"))
      .localCheckpoint()
    var frontier = starts
      .select(col(starts.columns.head).cast("long").as("walk_id"))
      .withColumn("cur", col("walk_id"))
      .localCheckpoint()
    val out = Seq.newBuilder[DataFrame]
    out += frontier.select(
      col("walk_id"), lit(0).as("step"), col("cur").as("id"))
    for (t <- 1 to steps) {
      val win = Window.partitionBy("walk_id")
      frontier = frontier
        .join(adj, Seq("cur"))
        .withColumn("cum", sum(col("w")).over(win.orderBy("dst")))
        .withColumn("tot", sum(col("w")).over(win))
        .withColumn("r",
          coin(lit("wwk"), lit(salt), col("walk_id"), lit(t)) % col("tot"))
        .filter(col("cum") - col("w") <= col("r") && col("r") < col("cum"))
        .select(col("walk_id"), col("dst").as("cur"))
        .localCheckpoint()
      out += frontier.select(
        col("walk_id"), lit(t).as("step"), col("cur").as("id"))
    }
    out.result().reduce(_.unionByName(_))
  }

  /** Second-order p/q-biased walks (node2vec). Transition weights from
    * (prev → cur): w = wBack if dst == prev (return), wAdj if dst is a
    * neighbor of prev (BFS-ish), wFar otherwise (DFS-ish) — INTEGER
    * weights, so the cumulative-weight pick (coin % Σw lands in a
    * neighbor's [cum−w, cum) slot) is exact on every engine. The paper's
    * (p, q) map to (wBack, wAdj, wFar) ∝ (1/p, 1, 1/q) scaled to
    * integers; e.g. p=2, q=1/2 → (1, 2, 4). Step 1 has no prev — it is
    * the uniform first-order step, drawn from the same coin stream.
    */
  def node2vecWalks(
      edges: DataFrame,
      starts: DataFrame,
      steps: Int,
      wBack: Int,
      wAdj: Int,
      wFar: Int,
      salt: String
  ): DataFrame = {
    require(steps >= 1 && wBack > 0 && wAdj > 0 && wFar > 0,
      "node2vecWalks: steps >= 1 and strictly positive integer weights")
    val adj = rankedAdjacency(edges)
    // (prev, dst) membership probe for the BFS-ish weight class; reuses
    // the checkpointed adjacency, renamed for the second join role
    val prevAdj = adj
      .select(col("cur").as("prev"), col("dst"), lit(1).as("isadj"))
    val s0 = starts
      .select(col(starts.columns.head).cast("long").as("walk_id"))
      .withColumn("cur", col("walk_id"))
      .localCheckpoint()
    val out = Seq.newBuilder[DataFrame]
    out += s0.select(col("walk_id"), lit(0).as("step"), col("cur").as("id"))
    // step 1: uniform (no prev yet)
    var frontier = s0
      .join(adj, Seq("cur"))
      .filter(col("rn") ===
        coin(lit("n2v"), lit(salt), col("walk_id"), lit(1)) % col("deg") + 1)
      .select(col("walk_id"), col("cur").as("prev"), col("dst").as("cur"))
      .localCheckpoint()
    out += frontier.select(
      col("walk_id"), lit(1).as("step"), col("cur").as("id"))
    for (t <- 2 to steps) {
      val win = Window.partitionBy("walk_id")
      frontier = frontier
        .join(adj, Seq("cur"))
        .join(prevAdj, Seq("prev", "dst"), "left")
        .withColumn("w",
          when(col("dst") === col("prev"), lit(wBack))
            .when(col("isadj").isNotNull, lit(wAdj))
            .otherwise(lit(wFar)))
        .withColumn("cum", sum(col("w")).over(win.orderBy("dst")))
        .withColumn("tot", sum(col("w")).over(win))
        .withColumn("r",
          coin(lit("n2v"), lit(salt), col("walk_id"), lit(t)) % col("tot"))
        .filter(col("cum") - col("w") <= col("r") && col("r") < col("cum"))
        .select(col("walk_id"), col("cur").as("prev"), col("dst").as("cur"))
        .localCheckpoint()
      out += frontier.select(
        col("walk_id"), lit(t).as("step"), col("cur").as("id"))
    }
    out.result().reduce(_.unionByName(_))
  }

  /** Skip-gram training rows from a walk table (walk_id, step, id):
    * positive (center, context) pairs within ±window on the same walk,
    * plus `negatives` uniform md5-drawn corpus negatives per POSITION
    * (label 0, context = rank→id lookup of coin % N). Output
    * (center, context, label, src_walk, src_step, off) — off is the
    * context offset for positives, −j for the j-th negative.
    */
  def skipGramPairs(
      walks: DataFrame,
      window: Int,
      negatives: Int,
      ids: DataFrame, // one column: the node-id universe
      salt: String
  ): DataFrame = {
    require(window >= 1 && negatives >= 0,
      "skipGramPairs: window >= 1, negatives >= 0")
    val w = walks.select(
      col("walk_id").as("src_walk"),
      col("step").cast("long").as("src_step"), col("id"))
    val ctx = walks.select(
      col("walk_id").as("c_walk"),
      col("step").cast("long").as("c_step"), col("id").as("context"))
    val pos = w
      .join(
        ctx,
        col("src_walk") === col("c_walk") &&
          abs(col("c_step") - col("src_step")) <= window &&
          col("c_step") =!= col("src_step"))
      .select(
        col("id").as("center"), col("context"), lit(1).as("label"),
        col("src_walk"), col("src_step"),
        (col("c_step") - col("src_step")).as("off"))
    if (negatives == 0) return pos
    // 0-based rank→id lookup via the distributed prefix-sum rank (no
    // global single-partition window)
    val universe = Packing
      .distributedRank(
        ids.select(col(ids.columns.head).cast("long").as("nid")),
        Seq(col("nid")), "r")
      .localCheckpoint()
    val n = universe.count()
    val negs = w
      .crossJoin(
        ids.sparkSession.range(1, negatives + 1).select(col("id").as("j")))
      .withColumn("draw",
        coin(lit("neg"), lit(salt), col("src_walk"), col("src_step"),
          col("j")) % lit(n))
      .join(universe, col("draw") === col("r"))
      .select(
        col("id").as("center"), col("nid").as("context"), lit(0).as("label"),
        col("src_walk"), col("src_step"), (-col("j")).cast("long").as("off"))
    pos.unionByName(negs)
  }
}
