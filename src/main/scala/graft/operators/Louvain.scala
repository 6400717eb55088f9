package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous Louvain phase-1 community detection (Blondel et al. 2008,
  * the local-move phase, in the synchronous all-nodes-at-once variant
  * distributed implementations use — the modularity counterpart of the
  * engine's label-propagation pass): every node simultaneously moves to
  * the neighbor community with the highest modularity gain, `rounds`
  * fixed rounds.
  *
  * ALL-INTEGER gain: for unweighted edges, the candidate ranking
  * `ΔQ(v→C) ∝ k_{v,C} − k(v)·Σtot′(C)/(2m)` is scaled by 2m into
  *
  *   score(v, C) = 2m·k_{v,C} − k(v)·(Σtot(C) − [C = c(v)]·k(v))
  *
  * (Σtot′ excludes v when scoring its own community), an exact BIGINT
  * both engines compute identically — no float enters the trajectory,
  * so the fixed schedule replays as unrolled SQL rounds and
  * hash-checks. Ties break toward the smallest community id; isolated
  * nodes keep their own singleton (their only candidate scores 0).
  *
  * Scale per round: one adjacency⋈state join (volume 2|E|, keyed on
  * node ids) + one community-degree aggregate (output = #communities) +
  * a per-node argmax over its ≤deg(v)+1 candidates — linear in edges;
  * state is one row per node, localCheckpoint-truncated. The integer
  * scores need 2m·deg_max < 2⁶³ — beyond that, route the two products
  * through DECIMAL(38,0).
  */
object Louvain {

  def louvainSync(
      edges: DataFrame, // directed (src, dst) — undirected internally
      ids: DataFrame, // one row per node id in the universe
      rounds: Int
  ): DataFrame = {
    require(rounds >= 1, s"louvainSync needs >= 1 round, got $rounds")
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
      .localCheckpoint()
    val m = und.count()
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .unionAll(und.select(col("b").as("id"), col("a").as("nb")))
      .localCheckpoint() // reused every round
    val nodes = ids.select(col("id").cast("long").as("id"))
    val deg = nodes
      .join(adj.groupBy(col("id")).agg(count(lit(1)).as("deg")), Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).cast("long").as("deg"))
      .localCheckpoint()
    var state = nodes.select(col("id"), col("id").as("community"))
      .localCheckpoint()
    var r = 0
    while (r < rounds) {
      val tot = state
        .join(deg, "id")
        .groupBy(col("community"))
        .agg(sum(col("deg")).as("tot"))
      val kvc = adj
        .join(state.select(col("id").as("nb"), col("community").as("cc")), "nb")
        .groupBy(col("id"), col("cc"))
        .agg(count(lit(1)).cast("long").as("kvc"))
      val cand = kvc
        .unionByName(state.select(
          col("id"), col("community").as("cc"), lit(0L).as("kvc")))
        .groupBy(col("id"), col("cc"))
        .agg(max(col("kvc")).as("kvc")) // own-community 0 merges with its real count
      val own = state.select(col("id"), col("community").as("own"))
      val scored = cand
        .join(deg, "id")
        .join(tot.select(col("community").as("cc"), col("tot")), "cc")
        .join(own, "id")
        .select(
          col("id"), col("cc"),
          (lit(2L * m) * col("kvc") -
            col("deg") * (col("tot") -
              when(col("cc") === col("own"), col("deg")).otherwise(lit(0L))))
            .as("score"))
      state = scored
        .withColumn("rn",
          row_number().over(
            Window.partitionBy(col("id"))
              .orderBy(col("score").desc, col("cc").asc)))
        .filter(col("rn") === 1)
        .select(col("id"), col("cc").as("community"))
        .localCheckpoint()
      r += 1
    }
    state
  }
}
