package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation over a neighbor graph (Zhu &
  * Ghahramani 2002, the GraphX-style semi-supervised labeler): a small
  * labeled seed set spreads through the kNN graph — each round every
  * UNLABELED node adopts the majority label among its currently-labeled
  * neighbors (ties (count DESC, label ASC) — deterministic), while seed
  * and already-propagated labels stay clamped. The weak-supervision
  * pass a curation pipeline uses to extend a hand-labeled slice to the
  * whole corpus.
  *
  * Deterministic by construction (no RNG, synchronous rounds, total
  * tie order), so the whole schedule replays as unrolled SQL rounds.
  *
  * Scale per round: one equi-join of the edge table against the
  * labeled state (shuffle keyed on the node id, volume = labeled-degree
  * sum), one count aggregate, one row_number majority pick, one left
  * join back — all linear in edges; state is one row per node,
  * localCheckpoint-truncated per round.
  */
object LabelProp {

  /** @param edges  directed (src, dst) pairs — undirected internally
    * @param seeds  (id, lab) — the clamped labeled subset
    * @param ids    one row per node id in the universe
    * @return (id, lab nullable long, role in {'seed','propagated','unlabeled'})
    */
  def labelPropagation(
      edges: DataFrame,
      seeds: DataFrame,
      ids: DataFrame,
      rounds: Int
  ): DataFrame = {
    require(rounds >= 1, s"labelPropagation needs >= 1 round, got $rounds")
    val und = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint() // reused every round
    // seeds deduped deterministically (min label per id): duplicate or
    // conflicting seed rows would otherwise fan out the state table on
    // the ids left-join — one propagated row (and one majority vote)
    // per duplicate, every round
    val s0 = seeds
      .select(col("id").cast("long").as("id"), col("lab").cast("long").as("lab"))
      .groupBy(col("id"))
      .agg(min(col("lab")).as("lab"))
    var state = ids.select(col("id").cast("long").as("id"))
      .join(s0, Seq("id"), "left")
      .localCheckpoint()
    var r = 0
    while (r < rounds) {
      val cnt = und
        .join(
          state.filter(col("lab").isNotNull)
            .select(col("id").as("src"), col("lab")),
          "src")
        .groupBy(col("dst").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val maj = cnt
        .withColumn("rn",
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("id"))
              .orderBy(col("c").desc, col("lab"))))
        .filter(col("rn") === 1)
        .select(col("id"), col("lab").as("mlab"))
      state = state
        .join(maj, Seq("id"), "left")
        .select(col("id"), coalesce(col("lab"), col("mlab")).as("lab"))
        .localCheckpoint()
      r += 1
    }
    state
      .join(s0.select(col("id"), lit(true).as("isSeed")), Seq("id"), "left")
      .select(
        col("id"), col("lab"),
        when(col("isSeed"), lit("seed"))
          .when(col("lab").isNotNull, lit("propagated"))
          .otherwise(lit("unlabeled")).as("role"))
  }
}
