package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: write a table hash-bucketed + sorted by its join
  * key so every later co-keyed join/aggregation reads it shuffle-free (the
  * write-once-join-many layout lever; see q27 + BucketingSpec for the
  * zero-exchange sort-merge join it buys).
  *
  * `saveBucketed` is idempotent across sessions: with the in-memory
  * catalog, a table written by a PREVIOUS session survives only as a
  * warehouse directory the new catalog knows nothing about, and a plain
  * `mode("overwrite").saveAsTable` then fails with
  * LOCATION_ALREADY_EXISTS — so the stale location is dropped explicitly
  * before the write.
  */
object Bucketing {

  def saveBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keyCol: String
  ): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // resolve the MANAGED location through the catalog itself (honors the
    // current database and db-qualified names — a hand-built
    // <warehouse>/<table> path would miss <warehouse>/<db>.db/<table> and
    // could delete an unrelated top-level warehouse entry)
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new Path(spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) {
      // a directory surviving the DROP is a previous session's orphan (the
      // in-memory catalog forgets managed tables across restarts). Refuse
      // to touch anything outside this session's warehouse root — data at
      // an external location is never ours to destroy — and log what goes.
      val warehouse =
        fs.makeQualified(new Path(spark.sessionState.conf.warehousePath))
      val locQ = fs.makeQualified(loc)
      val underWarehouse = Iterator
        .iterate(locQ.getParent)(_.getParent)
        .takeWhile(_ != null)
        .contains(warehouse)
      if (!underWarehouse) {
        throw new IllegalStateException(
          s"saveBucketed: refusing to delete $locQ — outside the session " +
            s"warehouse $warehouse; move or drop it explicitly")
      }
      org.slf4j.LoggerFactory
        .getLogger(getClass)
        .warn(s"saveBucketed: deleting orphaned table location $locQ")
      fs.delete(locQ, true)
    }
    df
      // pre-shuffle into the bucket layout: `repartition(n, key)` is the
      // same HashPartitioning the bucketed write requires, so each write
      // task holds exactly one bucket and writes ONE file — without this,
      // every input task writes a sliver of every bucket (tasks × buckets
      // small files, the classic bucketed-write file explosion)
      .repartition(buckets, org.apache.spark.sql.functions.col(keyCol))
      .write
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }
}
