package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed recall evaluation — the reference notebook's scoring step
  * (py/hnsw.ipynb cell-6 compares search results against the SIFT
  * ground-truth neighbor lists) as table-in/table-out operators: one
  * equi-join on (query, neighbor) + a per-query aggregate, so a
  * million-query evaluation is two shuffles of |Q|·k rows, never a
  * driver-side loop.
  */
object RecallEval {

  /** Ground truth from an ivecs table ([[graft.sources.Ivecs.read]]:
    * id = query index, vec = neighbor ids ranked ascending by distance) →
    * long-form (query_id, neighbor_id) truncated to the top `k`.
    */
  def truthFromIvecs(gt: DataFrame, k: Int): DataFrame =
    gt.select(
      col("id").as("query_id"),
      posexplode(col("vec")).as(Seq("pos", "neighbor_id"))
    )
      .filter(col("pos") < k)
      .select(col("query_id"), col("neighbor_id").cast("long").as("neighbor_id"))

  /** Per-query Recall@k of an approximate result (query_id, neighbor_id,
    * rnk — the engine's search output shape) against a long-form truth
    * table. Queries with zero hits keep a 0.0 row (left join), so the
    * mean over this table is the corpus recall.
    */
  def recallAtK(approx: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val hits = approx
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .join(
        truth.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")
      )
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"))
    approx
      .select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        (coalesce(col("n_hits"), lit(0L)) / k.toDouble).as("recall")
      )
  }

  /** Corpus-level summary: (n_queries, mean_recall, min_recall). */
  def summary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      avg(col("recall")).as("mean_recall"),
      min(col("recall")).as("min_recall")
    )
}
