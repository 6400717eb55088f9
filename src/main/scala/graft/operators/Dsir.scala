package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick raw-corpus documents that look like a small TARGET corpus, by
  * importance weights from two hashed n-gram bag-of-features language
  * models. Per document, log w(d) = Σ over feature occurrences of
  * ln p̂_target(bucket) − ln p̂_raw(bucket), with unigram+bigram word
  * features hashed into `buckets` buckets and add-1 smoothing — then
  * sample without replacement via Gumbel top-k, the paper's resampling
  * made deterministic with the engine's md5 coin (u = (h+0.5)/1000003,
  * g = −ln(−ln u), select top n by logw + g).
  *
  * Scale shape: the bucket LMs are two B-row aggregates (B = O(10³) —
  * broadcastable however big either corpus is); scoring is one join of
  * the feature stream against the B-row log-ratio table and a per-doc
  * decimal-exact sum (order-insensitive, engine-portable); selection is
  * a bounded TakeOrdered head. Nothing pairwise, nothing corpus-sized on
  * the driver. Cross-engine exactness: ln of identical doubles is
  * identical (the text_perplexity precedent), the per-doc sum routes
  * through DECIMAL(38,20), and the Gumbel coin is md5-derived.
  */
object Dsir {

  /** Unigram + bigram feature stream: one row per feature OCCURRENCE
    * (DSIR counts occurrences, not distinct features).
    */
  private def features(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
    toks.select(col("doc_id"), explode(col("t")).as("f"))
      .unionAll(
        toks
          .filter(size(col("t")) >= 2)
          .select(
            col("doc_id"),
            explode(expr(
              "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"
            )).as("f")))
  }

  private def bucketOf(f: Column, buckets: Int): Column =
    pmod(Dedup.md5Long(f), lit(buckets))

  /** The B-row log-ratio table (b, term) — term = ln p̂_target(b) −
    * ln p̂_raw(b), every bucket 0..B−1 present (a bucket absent from
    * either corpus still has an add-1 smoothed probability). This is the
    * model artifact: train once in batch, broadcast anywhere — including
    * to the stateless streaming scorer.
    */
  def logRatioTable(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 512
  ): DataFrame = {
    val crTab = features(raw, idCol, textCol)
      .select(bucketOf(col("f"), buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val ctTab = features(target, idCol, textCol)
      .select(bucketOf(col("f"), buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    logRatioFromCounts(raw.sparkSession, crTab, ctTab, buckets)
  }

  /** The log-ratio arithmetic over already-aggregated B-row bucket
    * counts — totals come from the SAME count tables (Σ counts = stream
    * length), so neither corpus-sized feature stream is ever scanned
    * twice.
    */
  private def logRatioFromCounts(
      spark: org.apache.spark.sql.SparkSession,
      crTab: DataFrame,
      ctTab: DataFrame,
      buckets: Int
  ): DataFrame = {
    spark
      .range(buckets).select(col("id").as("b"))
      .join(ctTab, Seq("b"), "left")
      .join(crTab, Seq("b"), "left")
      .select(
        col("b"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .crossJoin(broadcast(
        ctTab.agg(coalesce(sum(col("ct")), lit(0L)).as("tt"))))
      .crossJoin(broadcast(
        crTab.agg(coalesce(sum(col("cr")), lit(0L)).as("rt"))))
      .select(
        col("b"),
        (log((col("ct") + 1).cast("double")
            / (col("tt") + buckets).cast("double"))
          - log((col("cr") + 1).cast("double")
            / (col("rt") + buckets).cast("double"))).as("term"))
  }

  /** (doc_id, logw) for every raw doc. `target` is any DataFrame with the
    * same (idCol, textCol) shape — typically a small curated slice.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 512
  ): DataFrame = {
    // the raw feature stream is tokenize+explode over the whole corpus —
    // materialize it ONCE (localCheckpoint) and derive both the raw
    // bucket LM and the per-doc scoring join from the same pass; the
    // target stream (small curated slice) is scanned once for its counts
    val fbRaw = features(raw, idCol, textCol)
      .select(col("doc_id"), bucketOf(col("f"), buckets).as("b"))
      .localCheckpoint()
    val crTab = fbRaw.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val ctTab = features(target, idCol, textCol)
      .select(bucketOf(col("f"), buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val lb = logRatioFromCounts(raw.sparkSession, crTab, ctTab, buckets)
    raw.select(col(idCol).as("doc_id"))
      .join(
        fbRaw
          .join(broadcast(lb.select(col("b"), col("term"))), "b")
          .groupBy(col("doc_id"))
          .agg(sum(col("term").cast(DecimalType(38, 20))).cast("double").as("lw")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lw"), lit(0.0)).as("logw"))
  }

  /** Per-row (no-shuffle) scorer against a COLLECTED log-ratio table —
    * the streaming-safe spelling: the B terms ride the plan as an array
    * literal and each doc folds its own feature array through a
    * DECIMAL(38,20) accumulator (exact, so the fold order vs the batch
    * aggregation order cannot matter). `terms` must be the `buckets`
    * doubles of [[logRatioTable]] in bucket order.
    */
  def scoreRow(
      docs: DataFrame,
      terms: Seq[Double],
      idCol: String,
      textCol: String
  ): DataFrame = {
    val buckets = terms.length
    docs
      .select(
        col(idCol).as("doc_id"),
        split(col(textCol), " ").as("t"),
        typedLit(terms).as("terms"))
      .select(
        col("doc_id"),
        expr(
          "cast(aggregate(" +
            "concat(t, CASE WHEN size(t) >= 2 THEN " +
            "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1])) " +
            "ELSE array() END), " +
            "cast(0 AS decimal(38,20)), " +
            "(acc, f) -> cast(acc + cast(element_at(terms, cast(" +
            "pmod(cast(conv(substring(md5(f), 1, 14), 16, 10) AS bigint), " +
            s"$buckets) + 1 AS int)) AS decimal(38,20)) AS decimal(38,20))" +
            ") AS double)"
        ).as("logw"))
  }

  /** Gumbel top-n importance resample (without replacement): key =
    * logw + (−ln(−ln u)) with the deterministic md5 coin on the doc id.
    * Returns (doc_id, logw, sel_key, rnk), n rows, rnk 1..n by
    * (sel_key DESC, doc_id).
    */
  def resample(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      buckets: Int = 512
  ): DataFrame = {
    val u = (pmod(
      Dedup.md5Long(concat(col("doc_id").cast("string"), lit(":dsir"))),
      lit(1000003L)).cast("double") + lit(0.5)) / lit(1000003.0)
    val keyed = importanceWeights(raw, target, idCol, textCol, buckets)
      .withColumn("sel_key", col("logw") + -log(-log(u)))
    keyed
      .orderBy(col("sel_key").desc, col("doc_id"))
      .limit(n)
      .select(
        col("doc_id"), col("logw"), col("sel_key"),
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("sel_key").desc, col("doc_id"))).cast("long").as("rnk"))
  }
}
