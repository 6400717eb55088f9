package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg.topK
import graft.functions.VectorExpressions._

/** SRP-LSH approximate top-k cosine search — the FIFTH ANN index family
  * next to IVF, sharded HNSW, kNN-graph walks, and the RP-tree forest:
  * stateless hyperplane bucketing (Charikar 2002), the one index whose
  * "build" is a single map-only scan (no training, no graph, no tree —
  * each vector's banded sign signature IS its index entry), which makes
  * it the cheapest index to maintain under churn.
  *
  * Search: a query probes each band with its exact signature plus every
  * 1-bit flip (Lv et al. 2007 multi-probe — most of the recall extra
  * hash tables would buy, without replicating the index); candidates
  * are bucket collisions only, then an exact-cosine rerank over the
  * bounded candidate set via the bounded-heap top-k aggregate. Shares
  * [[Dedup]]'s signature kernel verbatim, so the dedup family and the
  * search family bucket identically by construction.
  *
  * Scale shape: index = one corpus scan emitting `bands` rows per
  * vector; search = an equi-join on (band, signature) — shuffle keyed
  * on bounded-cardinality buckets, volume = collisions, never |Q|·|B| —
  * then the rerank join touches only candidate ids. Per-partition
  * partial top-k bounds the final shuffle at O(|Q|·k·partitions). A
  * query colliding with nothing returns < k rows (no silent full-scan
  * fallback — the recall/candidate trade is the operator's contract,
  * audited by eval_dedup_blocking on the shared kernel).
  */
object LshKnn {

  def knnLsh(
      base: DataFrame,
      bidCol: String,
      bvecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = -1,
      multiProbe: Boolean = true
  ): DataFrame = {
    require(k >= 1, s"knnLsh: k must be >= 1, got $k")
    val bsigs = Dedup
      .srpBandSigs(base, bidCol, bvecCol, numPlanes, bands, dim)
      .select(col("id").as("bid"), col("band"), col("sig"))
    val qsigs = Dedup.srpBandSigs(queries, qidCol, qvecCol, numPlanes, bands, dim)
    val qprobes =
      (if (multiProbe) Dedup.withSigProbes(qsigs, numPlanes / bands)
       else qsigs.withColumn("psig", col("sig")))
        .select(col("id").as("qid"), col("band"), col("psig").as("sig"))
    val cand = qprobes
      .join(bsigs, Seq("band", "sig"))
      .select(col("qid"), col("bid"))
      .distinct()
    val bv = base.select(
      col(bidCol).as("bid"),
      col(bvecCol).cast("array<double>").as("bv"))
      .withColumn("bnorm", sqrt(dotFast(col("bv"), col("bv"))))
    val qv = queries.select(
      col(qidCol).as("qid"),
      col(qvecCol).cast("array<double>").as("qv"))
      .withColumn("qnorm", sqrt(dotFast(col("qv"), col("qv"))))
    cand
      .join(bv, "bid")
      .join(broadcast(qv), "qid")
      .groupBy(col("qid"))
      .agg(topK(
        -(dotFast(col("qv"), col("bv")) / (col("qnorm") * col("bnorm"))),
        col("bid"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(
        col("qid").as("query_id"),
        col("e.id").as("neighbor_id"),
        (-col("e.dist")).as("sim"),
        (col("pos") + 1).cast("int").as("rnk"))
  }
}
