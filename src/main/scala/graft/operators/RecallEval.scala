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
    // materialized once: `approx` is referenced by BOTH the hit join and
    // the query-universe distinct, and its upstream is typically an
    // expensive search plan that would re-execute per branch (no
    // cross-branch CSE) — the rankMetrics discipline
    val a0 = approx
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .localCheckpoint()
    val hits = a0
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .join(
        truth.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")
      )
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"))
    a0
      .select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        (coalesce(col("n_hits"), lit(0L)) / k.toDouble).as("recall")
      )
  }

  /** Per-query RANKED retrieval metrics — the evaluation pair every
    * serving stack reports beyond set-recall: MRR (reciprocal rank of
    * the TRUE nearest neighbor, i.e. the truth's rank-1 item, in the
    * approximate ranking; 0 when absent) and binary-relevance nDCG@k
    * (rel = membership in the truth top-k, DCG = Σ rel_i / log2(i+1),
    * ideal = the first min(k, |truth|) positions all relevant). Both
    * rankings arrive in the engine's (query_id, neighbor_id, rnk)
    * shape. Two equi-joins on (query, neighbor) + per-query aggregates
    * — |Q|·k rows end to end, no driver loop. Engine-portable floats:
    * log2 spelled ln(x)/ln(2) and the ≤k-term DCG sums routed through
    * DECIMAL(38,20), so both engines divide identical doubles.
    *
    * Query universe is TRUTH-ANCHORED: one metric row per query that
    * has ground truth (rr is built from truth's rank-1 rows); queries
    * present only in `approx` carry no relevance information and are
    * dropped from the metric table by design.
    */
  def rankMetrics(approx: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // materialized once: both rankings are <= |Q|*k rows but their
    // UPSTREAM plans (an ANN search, an exact kNN) are expensive, and
    // this function references `a` twice and `t` three times — without
    // the checkpoint each branch re-executes the full search (no
    // cross-branch CSE), tripling the metric's cost
    val a = approx.filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .localCheckpoint()
    val t = truth.filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk").as("trnk"))
      .localCheckpoint()
    // MRR: where does the truth's top-1 item land in the approx ranking?
    val rr = t.filter(col("trnk") === 1)
      .join(a, Seq("query_id", "neighbor_id"), "left")
      .select(
        col("query_id"),
        coalesce(lit(1.0) / col("rnk"), lit(0.0)).as("rr"))
    // binary-relevance DCG over the approx ranking
    val lg2 = log(lit(2.0))
    val dcg = a
      .join(t.select(col("query_id"), col("neighbor_id"),
        lit(1).as("rel")), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        sum(
          when(col("rel").isNotNull,
            (lit(1.0) / (log(col("rnk").cast("double") + 1) / lg2))
              .cast(DecimalType(38, 20)))
            .otherwise(lit(null))).cast("double").as("dcg"))
    // ideal DCG: the first min(k, |truth|) positions all relevant
    val idcg = t.groupBy(col("query_id"))
      .agg(count(lit(1)).as("nt"))
      .select(
        col("query_id"),
        expr(
          s"""aggregate(sequence(1, int(least(nt, $k))),
             |  cast(0 as decimal(38,20)),
             |  (acc, i) -> cast(acc + cast(1.0d / (ln(double(i) + 1d) / ln(2.0d))
             |                   as decimal(38,20)) as decimal(38,20)))
             |""".stripMargin.replace("\n", " ")).cast("double").as("idcg"))
    rr
      .join(dcg, Seq("query_id"), "left")
      .join(idcg, Seq("query_id"), "left")
      .select(
        col("query_id"), col("rr"),
        (coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  /** Corpus-level summary: (n_queries, mean_recall, min_recall). */
  def summary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      avg(col("recall")).as("mean_recall"),
      min(col("recall")).as("min_recall")
    )

  /** The IVF tuning curve: mean Recall@k for SEVERAL nprobe settings in
    * ONE plan — (nprobe, n_queries, mean_recall), the recall/cost frontier
    * an operator reads before picking nprobe. Probe ranks are computed
    * once (|Q|·nCells rows); each nprobe setting reuses them via a tiny
    * values-table join (`rn <= nprobe`), so the sweep costs one candidate
    * scan per setting over only the probed cells — never a rebuilt index
    * or a re-ranked probe set per point on the curve.
    *
    * Deterministic under fixed centroids; the mean routes through a
    * decimal (Q.davg) so it is exact regardless of aggregation order.
    */
  def ivfNprobeCurve(
      base: DataFrame, // (id, vec, cell) from IvfIndex.assign
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      centroids: Array[Array[Double]],
      nprobes: Seq[Int],
      k: Int
  ): DataFrame = {
    import graft.functions.TopKAgg.topK
    import graft.functions.VectorExpressions.l2SqFast
    import graft.queries.Q.davg
    import org.apache.spark.sql.expressions.Window
    val spark = base.sparkSession
    import spark.implicits._
    val centsDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cvec")
    val maxNp = nprobes.max
    val ranked = queries
      .crossJoin(broadcast(centsDf))
      .withColumn("cd", l2SqFast(col(qvecCol), col("cvec")))
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col(qidCol)).orderBy(col("cd"), col("cell"))))
      .filter(col("rn") <= maxNp)
      .select(col(qidCol), col("cell"), col("rn"), col(qvecCol))
    // Score every candidate ONCE at the widest probe set, tagged with its
    // cell's probe rank; a narrower operating point is then a null-gated
    // heap over the same scored rows (TopKAgg skips nulls), not its own
    // probe join — the former per-nprobe shape re-scored a rank-1 cell's
    // candidates once per setting (~2x the distance work for {1,2,4,8}).
    // Exact under IVF's disjoint cells: each (query, id) appears once,
    // with its cell's rank, so `rn <= np` reproduces the np-probe
    // candidate set bit for bit.
    val scored = base
      .join(ranked, "cell")
      .select(
        col(qidCol), col("id"), col("rn"),
        l2SqFast(col(qvecCol), col("vec")).as("dist"))
    val heapCols = nprobes.map(np =>
      topK(when(col("rn") <= np, col("dist")), col("id"), k).as(s"tk$np"))
    val approx = scored
      .groupBy(col(qidCol))
      .agg(heapCols.head, heapCols.tail: _*)
      .select(
        col(qidCol),
        explode(array(nprobes.map(np =>
          struct(
            lit(np.toLong).as("nprobe"),
            col(s"tk$np.id").as("ids"))): _*)).as("x"))
      .select(
        col("x.nprobe").as("nprobe"), col(qidCol),
        explode(col("x.ids")).as("neighbor_id"))
    val truth = BruteForceKNN
      .knn(
        queries, base.select(col("id").as("neighbor_id"), col("vec").as("bv")),
        k, qidCol = qidCol, qvecCol = qvecCol)
      .select(col(qidCol), col("neighbor_id"))
    // ONE pass over the expensive approx subtree: left-join the truth set
    // (|Q|·k rows) onto it and count hits and group existence in the same
    // aggregation — the former two-consumer shape (inner-join for hits +
    // distinct for the denominator) evaluated the whole probed-search
    // subtree twice
    approx
      .join(truth.withColumn("hit", lit(1L)), Seq(qidCol, "neighbor_id"), "left")
      .groupBy(col("nprobe"), col(qidCol))
      .agg((sum(coalesce(col("hit"), lit(0L))) / k.toDouble).as("recall"))
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_queries"), davg(col("recall")).as("mean_recall"))
  }
}
