package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** HITS hubs-and-authorities (Kleinberg 1999) over the DIRECTED
  * neighbor graph — the asymmetric complement of PageRank's
  * random-walk centrality: on a kNN graph, a high AUTHORITY is a
  * vector many other vectors choose as a near neighbor (a density
  * representative — the hub phenomenon of high-dimensional kNN), while
  * a high HUB is a vector whose own neighbor list points at
  * authorities. Synchronous mutual recursion with per-round L2
  * normalization:
  *
  *   a_{r}(v) = Σ_{u→v} h_{r−1}(u) / ‖·‖₂ ;  h_r(v) = Σ_{v→w} a_r(w) / ‖·‖₂
  *
  * Engine-portable by the engine's standard discipline: every per-node
  * accumulation and the norm's sum-of-squares route through
  * DECIMAL(38,20) (exact, order-free), the square root and the
  * divisions then act on identical doubles — so a fixed round schedule
  * replays as unrolled SQL rounds.
  *
  * Scale per round: two edge⋈score equi-joins (shuffle keyed on the
  * node id, volume |E| each), two decimal aggregates, two broadcast
  * scalar norms — linear in edges; score state is one row per node,
  * localCheckpoint-truncated.
  */
object Hits {

  /** @param edges directed (src, dst) — used as-is (no undirecting:
    *               the src→dst asymmetry IS the signal)
    * @param ids   one row per node id in the universe
    * @return (id, authority, hub) after `rounds` full a-then-h updates
    */
  def hits(edges: DataFrame, ids: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"hits needs >= 1 round, got $rounds")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = ids.select(col("id").cast("long").as("id")).localCheckpoint()
    def normalized(raw: DataFrame): DataFrame = {
      val all = nodes
        .join(raw, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("s"))
      val nrm = all.agg(
        sqrt(sum((col("s") * col("s")).cast(DecimalType(38, 20)))
          .cast("double")).as("nrm"))
      all
        .crossJoin(broadcast(nrm))
        .select(
          col("id"),
          when(col("nrm") > 0, col("s") / col("nrm"))
            .otherwise(lit(0.0)).as("s"))
    }
    var h = nodes.withColumn("s", lit(1.0)).localCheckpoint()
    var a: DataFrame = null
    var r = 0
    while (r < rounds) {
      a = normalized(
        e.join(h.select(col("id").as("src"), col("s").as("hs")), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(col("hs").cast(DecimalType(38, 20))).cast("double").as("s")))
        .localCheckpoint()
      h = normalized(
        e.join(a.select(col("id").as("dst"), col("s").as("as_")), "dst")
          .groupBy(col("src").as("id"))
          .agg(sum(col("as_").cast(DecimalType(38, 20))).cast("double").as("s")))
        .localCheckpoint()
      r += 1
    }
    h.select(col("id"), col("s").as("hub"))
      .join(a.select(col("id"), col("s").as("authority")), "id")
      .select(col("id"), col("authority"), col("hub"))
  }
}
