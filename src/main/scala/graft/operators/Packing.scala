package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-shaping operators for training-data pipelines: sliding-window
  * chunking and concat-and-chunk packing — the steps between "clean
  * documents" and "fixed-length training sequences".
  *
  * Both are deterministic token-index arithmetic (no RNG, no float), so
  * they are DuckDB-oracle-checked end to end.
  */
object Packing {

  /** Sliding-window chunks: every `stride`-aligned window of up to `size`
    * tokens per document. Start offsets are 0, stride, 2·stride, … < n;
    * the tail chunk is partial. Pure per-row explode — embarrassingly
    * parallel, no shuffle at all.
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int
  ): DataFrame = {
    require(chunkSize >= 1 && stride >= 1, "chunkSize and stride must be >= 1")
    df.select(
        col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("t")
      )
      .select(
        col("doc_id"),
        col("t"),
        size(col("t")).cast("long").as("n"),
        explode(expr(s"sequence(0, size(t) - 1, $stride)")).as("start")
      )
      .select(
        col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        least(lit(chunkSize.toLong), col("n") - col("start")).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("t"), (col("start") + 1).cast("int"), lit(chunkSize)))
          .as("chunk_text")
      )
  }

  /** Concat-and-chunk packing offsets: documents are laid end to end in
    * `idCol` order; each doc's `offset` is the global token position where
    * it starts, and `pack_id = offset / ctx` is the training sequence its
    * first token lands in.
    *
    * The global running sum is a DISTRIBUTED PREFIX SUM, not a
    * single-partition window (the classic scale trap for cumulative
    * sums): range-repartition by id, aggregate one total per partition
    * (a ≤ numPartitions-row collect, bounded however large the corpus),
    * prefix those on the driver, then add a within-partition running
    * window. Any range split yields the same global offsets, because
    * range partitions are disjoint ordered id intervals.
    */
  def packOffsets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ctx: Int
  ): DataFrame = {
    require(ctx >= 1, "ctx must be >= 1")
    val base = df
      .select(
        col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens")
      )
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // evaluate once: totals collect + the window below
    val prefixDf = pidPrefixes(base, sum(col("n_tokens")))
    val w = Window
      .partitionBy(col("pid"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(prefixDf), "pid")
      .withColumn(
        "offset",
        col("prefix") + coalesce(sum(col("n_tokens")).over(w), lit(0L))
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("offset"),
        (col("offset") / ctx).cast("long").as("pack_id")
      )
  }

  /** No-split sequence packing (the SFT regime, where [[packOffsets]]'s
    * concat-and-chunk is wrong because examples must not straddle pack
    * boundaries): next-fit-decreasing bin packing per group — docs
    * sorted by (tokens desc, id), walked once, a new bin opened whenever
    * the current doc no longer fits `ctx`. A doc longer than `ctx` gets
    * a bin of its own (callers chunk or drop oversize docs upstream).
    *
    * Returns (group, doc_id, n_tokens, bin, fill) with bins numbered
    * from 0 in walk order and `fill` the bin occupancy AFTER placing the
    * doc.
    *
    * Scale: the walk is sequential BY CONSTRUCTION (each placement
    * depends on the running fill), so parallelism comes from the group
    * key — language, source shard, curriculum bucket — exactly how
    * packing runs in production (per-stratum). Each group sorts and
    * walks inside one task (flatMapGroups); nothing is ever
    * driver-collected. Deterministic: the (tokens desc, id) order is a
    * total order, so reruns and repartitionings bin identically.
    *
    * When a single stratum is itself corpus-sized (one language of a
    * 100 TB crawl), `subShards > 1` salts the group with a deterministic
    * md5 shard of the doc id — packing quality is stratum-local anyway
    * (NFD waste changes negligibly under random splits), and the walk
    * regains task-level parallelism within the stratum. Group ids become
    * `<group>#<shard>`; bins number per salted group.
    */
  def binPack(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      ctx: Int,
      subShards: Int = 1
  ): DataFrame = {
    require(ctx >= 1, "ctx must be >= 1")
    require(subShards >= 1, "subShards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val groupExpr =
      if (subShards <= 1) col(groupCol).cast("string")
      else concat(
        col(groupCol).cast("string"), lit("#"),
        pmod(Dedup.md5Long(col(idCol).cast("string")), lit(subShards))
          .cast("string"))
    df
      .select(
        groupExpr.as("group"),
        col(idCol).cast("long").as("doc_id"),
        // null text packs as a zero-token doc instead of failing the
        // encoder — the graceful-degradation convention of the other
        // text operators
        coalesce(size(split(col(textCol), " ")).cast("long"), lit(0L))
          .as("n_tokens")
      )
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val docs = it.map { case (_, id, n) => (id, n) }.toArray
          .sortBy { case (id, n) => (-n, id) }
        var bin = -1L
        var fill = 0L
        docs.iterator.map { case (id, n) =>
          if (bin >= 0 && fill + n <= ctx) fill += n
          else { bin += 1; fill = n }
          (g, id, n, bin, fill)
        }
      }
      .toDF("group", "doc_id", "n_tokens", "bin", "fill")
  }

  /** Shared half of the distributed prefix sum: per-`pid` totals of `agg`
    * (a bounded ≤ numPartitions-row collect), prefixed on the driver,
    * returned as a broadcastable (pid, prefix) dimension where
    * `prefix(i)` = sum of totals of partitions BEFORE pid i.
    */
  private def pidPrefixes(
      base: DataFrame,
      agg: org.apache.spark.sql.Column
  ): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val totals = base
      .groupBy(col("pid"))
      .agg(agg.as("total"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val prefixes = totals
      .scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
      .init
      .map(_._2)
    totals.map(_._1).zip(prefixes).toSeq.toDF("pid", "prefix")
  }

  /** Distributed 0-based global rank under a TOTAL order (the sort key
    * must be unique, e.g. tie-broken on a key column): range-repartition
    * on the sort columns, count one total per partition (a bounded
    * ≤ numPartitions-row collect), prefix on the driver, then a
    * within-partition row_number plus the partition's prefix. Identical
    * output to `row_number().over(Window.orderBy(...)) - 1` but without
    * collapsing the table into one partition — the same prefix-sum move
    * as [[packOffsets]], packaged for ranking (used by text_vocab, where
    * "the vocabulary" is only small until the corpus is a web crawl).
    */
  def distributedRank(
      df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      rankName: String
  ): DataFrame = {
    val base = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // evaluate once: counts collect + the window below
    val prefixDf = pidPrefixes(base, count(lit(1)))
    val w = Window.partitionBy(col("pid")).orderBy(sortCols: _*)
    base
      .join(broadcast(prefixDf), "pid")
      .withColumn(
        rankName,
        (col("prefix") + row_number().over(w) - 1).cast("long"))
      .drop("pid", "prefix")
  }
}
