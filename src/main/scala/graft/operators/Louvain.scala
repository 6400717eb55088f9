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

  /** The full two-level Louvain (phase 1 → CONTRACT → phase 1 on the
    * coarse graph → project back): after `rounds1` sync local-move
    * rounds, communities contract into super-nodes — cross-community
    * edge multiplicities become integer edge WEIGHTS, internal edges
    * become SELF-WEIGHTS s(C) (they ride along in the super-node's
    * weighted degree k = Σw + 2s but never enter k_{v,C}, since a
    * self-loop moves with its node) — and `rounds2` WEIGHTED rounds run
    * on the contracted graph with the ORIGINAL total edge mass m
    * (contraction conserves it: Σw′ + Σs = m, so modularity gains stay
    * commensurable across levels). Every quantity is still an integer —
    * the same 2m-scaled score, now over weighted sums — so both levels
    * and the contraction replay as SQL and hash-check.
    *
    * Scale: the contraction is two grouping aggregates over the edge
    * list; the coarse graph is communities-sized, so phase-2 rounds are
    * usually driver-cheap; the projection is one join.
    *
    * @return (id, community) — original node ids, coarse community labels
    */
  def louvainTwoLevel(
      edges: DataFrame,
      ids: DataFrame,
      rounds1: Int = 3,
      rounds2: Int = 2
  ): DataFrame =
    louvainTwoLevelFrom(
      edges, louvainSync(edges, ids, rounds1).localCheckpoint(), rounds2)

  /** [[louvainTwoLevel]] over an ALREADY-COMPUTED phase-1 partition —
    * the materialize-once split when several consumers share the
    * phase-1 result (knn_graph_louvain serves it directly; the
    * two-level query contracts the same table).
    */
  def louvainTwoLevelFrom(
      edges: DataFrame,
      p1: DataFrame, // (id, community) — the phase-1 partition
      rounds2: Int
  ): DataFrame = {
    require(rounds2 >= 1, s"louvainTwoLevel needs >= 1 coarse round, got $rounds2")
    val und = edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .distinct()
      .localCheckpoint()
    val m = und.count()
    val ca = p1.select(col("id").as("a"), col("community").as("cA"))
    val cb = p1.select(col("id").as("b"), col("community").as("cB"))
    val tagged = und.join(ca, "a").join(cb, "b").localCheckpoint()
    val cross = tagged
      .filter(col("cA") =!= col("cB"))
      .groupBy(
        least(col("cA"), col("cB")).as("a"),
        greatest(col("cA"), col("cB")).as("b"))
      .agg(count(lit(1)).cast("long").as("w"))
    val selfw = tagged
      .filter(col("cA") === col("cB"))
      .groupBy(col("cA").as("id"))
      .agg(count(lit(1)).cast("long").as("s"))
    val coarseIds = p1.select(col("community").as("id")).distinct()
    val p2 = weightedSyncRounds(cross, selfw, coarseIds, m, rounds2)
    p1.select(col("id"), col("community").as("c1"))
      .join(p2.select(col("id").as("c1"), col("community")), "c1")
      .select(col("id"), col("community"))
  }

  /** The weighted local-move rounds phase 2 runs: undirected weighted
    * edges (a, b, w), per-node self-weights s (weighted degree
    * k = Σw + 2s; self-loops never enter k_{v,C}), total edge mass `m`
    * fixed by the caller. Same all-integer 2m-scaled score, but
    * SEMI-synchronous: in round r only nodes with (id + r) % 2 = 0
    * accept their move, the rest hold — the standard distributed-Louvain
    * swap guard (two coarse super-nodes that each profit from joining
    * the other would otherwise exchange communities forever under a
    * fully synchronous update; alternating parity lets one commit and
    * the other then confirm). Deterministic and SQL-replayable.
    */
  private def weightedSyncRounds(
      undw: DataFrame, // (a, b, w) undirected unique weighted edges
      selfw: DataFrame, // (id, s)
      ids: DataFrame, // one row per node id
      m: Long,
      rounds: Int
  ): DataFrame = {
    val adj = undw.select(col("a").as("id"), col("b").as("nb"), col("w"))
      .unionAll(undw.select(col("b").as("id"), col("a").as("nb"), col("w")))
      .localCheckpoint()
    val nodes = ids.select(col("id").cast("long").as("id"))
    val deg = nodes
      .join(adj.groupBy(col("id")).agg(sum(col("w")).as("wsum")), Seq("id"), "left")
      .join(selfw, Seq("id"), "left")
      .select(
        col("id"),
        (coalesce(col("wsum"), lit(0L)) + lit(2L) * coalesce(col("s"), lit(0L)))
          .cast("long").as("deg"))
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
        .agg(sum(col("w")).cast("long").as("kvc"))
      val cand = kvc
        .unionByName(state.select(
          col("id"), col("community").as("cc"), lit(0L).as("kvc")))
        .groupBy(col("id"), col("cc"))
        .agg(max(col("kvc")).as("kvc"))
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
      val moved = scored
        .withColumn("rn",
          row_number().over(
            Window.partitionBy(col("id"))
              .orderBy(col("score").desc, col("cc").asc)))
        .filter(col("rn") === 1)
        .select(col("id"), col("cc").as("community"))
      val rr = r + 1
      state = moved
        .filter((col("id") + lit(rr.toLong)) % 2 === 0)
        .unionByName(
          state.filter((col("id") + lit(rr.toLong)) % 2 =!= 0))
        .localCheckpoint()
      r += 1
    }
    state
  }
}
