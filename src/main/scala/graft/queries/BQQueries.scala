package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.BinaryQuantizer
import Q._

/** Binary-quantization query surface. Like SQ8 (and unlike PQ's seeded
  * k-means), training is a deterministic min/max aggregate, so the whole
  * pipeline — train → pack → Hamming top-k — is DuckDB-oracle-checked end
  * to end. The mid-range threshold rule and LSB-first 16-bit packing are
  * pinned with identical op order on both sides (see
  * [[graft.operators.BQModel]]), so words and distances hash-match
  * exactly (integer Hamming ties break on neighbor_id, mirrored in the
  * oracle's ORDER BY).
  */
object BQQueries {

  private val D = 64
  private val K = 5

  /** Shared oracle CTEs: min/max training, the strict mid-range bit rule,
    * and the 16-bit word packing — the SQL mirror of
    * `BinaryQuantizer.train` + `BQModel.encodeVec`.
    */
  private val bqCtes = s"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    js AS (SELECT unnest(generate_series(1, $D)) AS j),
    stats AS (SELECT j, min(ev[j]) AS lo, max(ev[j]) AS hi
              FROM e CROSS JOIN js GROUP BY j),
    st AS (SELECT list(lo ORDER BY j) AS lo, list(hi ORDER BY j) AS hi
           FROM stats),
    bits AS (
      SELECT e.vec_id, js.j,
             CASE WHEN e.ev[js.j] >
                    st.lo[js.j] + (st.hi[js.j] - st.lo[js.j]) / 2.0
                  THEN 1 ELSE 0 END AS b
      FROM e CROSS JOIN js CROSS JOIN st),
    words AS (
      SELECT vec_id, ((j - 1) // 16)::BIGINT AS w,
             sum(b * (1 << ((j - 1) % 16)))::BIGINT AS word
      FROM bits GROUP BY vec_id, w)
  """

  val all: Seq[GQuery] = Seq(
    // Packed sign-bit codes, long-form (vec_id, w, word) — round-trips
    // the kernel's packing against the oracle's arithmetic packing, with
    // training inside the oracle too.
    GQuery(
      "bq_encode",
      (spark, dir) => {
        val emb = t(spark, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
        val model = BinaryQuantizer.train(emb, "vec")
        BinaryQuantizer.encodePartitioned(emb, "vec_id", "vec", model)
          .select(col("vec_id"), posexplode(col("words")).as(Seq("w", "word")))
          .select(
            col("vec_id"),
            col("w").cast("long").as("w"),
            col("word").cast("long").as("word")
          )
      },
      Some(s"""
        WITH $bqCtes
        SELECT vec_id, w, word FROM words
      """)
    ),
    // Hamming top-5 per query over the packed codes: both sides encode
    // through the same kernel, the distance is Σ popcount(xor) over four
    // 16-bit words, the merge is the bounded heap below the exchange —
    // the 1-bit analog of sq_adc_topk.
    GQuery(
      "bq_hamming_topk",
      (spark, dir) => {
        val emb = t(spark, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
        val model = BinaryQuantizer.train(emb, "vec")
        val codes = BinaryQuantizer.encodePartitioned(emb, "vec_id", "vec", model)
        val q = codes
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("query_id"), col("words").as("qw"))
        codes
          .select(col("vec_id").as("neighbor_id"), col("words").as("cw"))
          .join(broadcast(q))
          .withColumn(
            "dist",
            expr("aggregate(zip_with(qw, cw, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
              .cast("double")
          )
          .groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg
            .topK(col("dist"), col("neighbor_id"), K).as("tk"))
          .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
          .select(
            col("query_id"),
            col("e.id").as("neighbor_id"),
            col("e.dist").cast("long").as("dist"),
            (col("pos") + 1).cast("long").as("rnk")
          )
      },
      Some(s"""
        WITH $bqCtes,
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 sum(bit_count(xor(q.word, c.word)))::BIGINT AS dist
          FROM words q JOIN words c ON q.w = c.w
          WHERE q.vec_id % 10 = 0
          GROUP BY 1, 2),
        r AS (SELECT query_id, neighbor_id, dist,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY dist, neighbor_id) AS rnk
              FROM pairs)
        SELECT query_id, neighbor_id, dist, rnk
        FROM r WHERE rnk <= $K
      """)
    ),
    // Two-stage bit-vector retrieval: Hamming over 1-bit codes bounds the
    // candidates to kShort=30/query (stage 1 reads 64 BITS per vector —
    // the 64× byte cut is the scan win at 100 TB), exact L2² reranks only
    // the broadcast |Q|·30 shortlist. Deterministic training + integer
    // Hamming + id tie-breaks -> the WHOLE pipeline (train, pack, filter,
    // rerank) sits under one DuckDB oracle — no rows-only weakening.
    GQuery(
      "knn_bq_rerank",
      (spark, dir) => {
        val fast = graft.functions.VectorExpressions
        val emb = t(spark, dir, "embeddings")
          .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
        val model = BinaryQuantizer.train(emb, "vec")
        val codes = BinaryQuantizer.encodePartitioned(emb, "vec_id", "vec", model)
        val qc = codes
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("query_id"), col("words").as("qw"))
        val shortlist = codes
          .select(col("vec_id").as("nid"), col("words").as("cw"))
          .join(broadcast(qc))
          .withColumn(
            "hdist",
            expr("aggregate(zip_with(qw, cw, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
              .cast("double")
          )
          .groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg
            .topK(col("hdist"), col("nid"), 30).as("tk"))
          .select(col("query_id"), explode(col("tk.id")).as("nid"))
        val q = emb
          .filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("qq"), col("vec").as("qv"))
        emb
          .select(col("vec_id").as("neighbor_id"), col("vec").as("bv"))
          .join(broadcast(shortlist), col("neighbor_id") === col("nid"))
          .join(broadcast(q), col("qq") === col("query_id"))
          .groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg
            .topK(fast.l2SqFast(col("qv"), col("bv")), col("neighbor_id"), K)
            .as("tk"))
          .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
          .select(
            col("query_id"),
            col("e.id").as("neighbor_id"),
            round(col("e.dist"), 4).as("dist"),
            (col("pos") + 1).cast("long").as("rnk")
          )
      },
      Some(s"""
        WITH $bqCtes,
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 sum(bit_count(xor(q.word, c.word)))::BIGINT AS hdist
          FROM words q JOIN words c ON q.w = c.w
          WHERE q.vec_id % 10 = 0
          GROUP BY 1, 2),
        sl AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY hdist, neighbor_id) AS rn
                 FROM pairs) WHERE rn <= 30),
        rr AS (SELECT s.query_id, s.neighbor_id,
                      ${sqlL2Sq("qe.ev", "ne.ev")} AS dist
               FROM sl s
               JOIN e qe ON qe.vec_id = s.query_id
               JOIN e ne ON ne.vec_id = s.neighbor_id),
        r AS (SELECT query_id, neighbor_id, dist,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY dist, neighbor_id) AS rnk
              FROM rr)
        SELECT query_id, neighbor_id, round(dist, 4) AS dist, rnk
        FROM r WHERE rnk <= $K
      """)
    )
  )
}
