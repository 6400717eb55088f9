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
  *   pr₀(v) = 1/N;  pr_{r+1}(v) = (1−d)/N + d·Σ_{u→v} pr_r(u)/outdeg(u)
  *
  * over the UNDIRECTED neighbor edge set (each edge contributes both
  * ways). Mass leaving isolated nodes is dropped (the simplified
  * dangling-node convention, stated here) — ranks still order nodes by
  * in-neighborhood density, which is all selection needs.
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
  ): DataFrame = {
    require(rounds >= 1, s"pageRank needs >= 1 round, got $rounds")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1): $damping")
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint() // reused by the degree table + every round
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val nodes = ids.select(col("id").cast("long").as("id")).localCheckpoint()
    val n = nodes.count()
    var pr = nodes.withColumn("pr", lit(1.0) / n).localCheckpoint()
    var r = 0
    while (r < rounds) {
      val contrib = und
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(deg.select(col("id").as("src"), col("deg")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum((col("pr") / col("deg")).cast(DecimalType(38, 20)))
          .cast("double").as("s"))
      pr = nodes
        .join(contrib, Seq("id"), "left")
        .select(
          col("id"),
          (lit(1.0 - damping) / n
            + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
        .localCheckpoint()
      r += 1
    }
    pr
  }
}
