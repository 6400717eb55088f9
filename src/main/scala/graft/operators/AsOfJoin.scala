package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed as-of join (SURVEY.md §2 C8): for every left row, the
  * latest right row of the same key at-or-before the left row's
  * timestamp; ties on the right timestamp break to the smallest right id.
  *
  * Shape: ONE hash shuffle on the key, a partition-local sort on
  * (key, ts, side), then a streaming sweep that carries the best
  * right-row-so-far — O(1) state per key, rows processed once. The naive
  * spelling (equi-join on key with a `r_ts <= l_ts` residual, then a
  * rank-1 window) materializes |L_k|·|R_k| rows per key before the window
  * discards all but one; a single hot key with 10⁴ rows each side is a
  * 10⁸-row hotspot. Here the same key costs |L_k| + |R_k| rows: skew in
  * the key distribution degrades to a larger sort run, never to a pair
  * explosion.
  */
object AsOfJoin {

  /** One tagged event of the merged stream: key, row id, micros
    * timestamp, side (left = the "probe" side that receives a match).
    */
  private[graft] final case class Ev(k: Long, id: Long, ts: Long, lft: Boolean)

  /** Both inputs must have columns (id: long, k: long, ts: long) — ids
    * unique per side, `ts` in integer units (e.g. epoch micros). Returns
    * (left_id, k, right_id, lag = left.ts - right.ts); left rows with no
    * right row at-or-before them are dropped (inner as-of semantics).
    */
  def lastAtOrBefore(left: DataFrame, right: DataFrame): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val tagged = left
      .select(col("k").cast("long").as("k"), col("id").cast("long").as("id"),
        col("ts").cast("long").as("ts"), lit(true).as("lft"))
      .unionByName(right.select(
        col("k").cast("long").as("k"), col("id").cast("long").as("id"),
        col("ts").cast("long").as("ts"), lit(false).as("lft")))
      .as[Ev]
    tagged
      .repartition(col("k"))
      // at equal ts the right side sorts first (false < true), so a
      // same-instant right row is visible to its left row
      .sortWithinPartitions(col("k"), col("ts"), col("lft"))
      .mapPartitions { it =>
        var curK = 0L
        var haveK = false
        var sTs = Long.MinValue
        var sId = Long.MaxValue
        var haveS = false
        it.flatMap { e =>
          if (!haveK || e.k != curK) {
            curK = e.k; haveK = true
            haveS = false; sTs = Long.MinValue; sId = Long.MaxValue
          }
          if (!e.lft) {
            // carry the latest right row; ties keep the smallest id
            if (e.ts > sTs || (e.ts == sTs && e.id < sId)) {
              sTs = e.ts; sId = e.id
            }
            haveS = true
            Iterator.empty
          } else if (haveS) {
            Iterator.single((e.id, e.k, sId, e.ts - sTs))
          } else Iterator.empty
        }
      }
      .toDF("left_id", "k", "right_id", "lag")
  }
}
