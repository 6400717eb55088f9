package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyword retrieval over the documents table — the lexical complement to
  * the vector-search surface (a user of the reference's embedding search
  * pairs it with BM25 for hybrid retrieval; the engine should answer both
  * from one table).
  *
  * Shape at scale: classic inverted-index algebra as dataflow. The corpus
  * tokenizes once; the (doc, term) postings are FILTERED TO THE QUERY'S
  * TERMS BEFORE any shuffle (the only aggregations that shuffle carry
  * ≤ |terms| rows per doc); document frequencies collapse to ≤ |terms|
  * rows and broadcast; corpus stats (N, avgdl) are a 1-row broadcast. The
  * final top-k is Spark's TakeOrderedAndProject — per-partition heads, no
  * global sort. Nothing in the plan is proportional to |corpus| × |terms|
  * beyond the single streaming pass over the postings.
  */
object TextSearch {

  /** Okapi BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·dl/avgdl)) with the Robertson–Spärck Jones
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). Returns (doc_id, score,
    * rnk) for the k highest-scoring docs, score rounded to 6 places BEFORE
    * ranking so the ordering is reproducible across engines; ties break on
    * ascending doc_id.
    *
    * The per-doc sum over terms routes through a decimal (Q.dsum pattern)
    * so it is exact regardless of partial-aggregation order.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 20
  ): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val toks = docs.select(
      col(idCol).as("doc_id"),
      split(col(textCol), " ").as("t")
    )
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl").cast(DecimalType(30, 6))).cast("double") / count(lit(1)))
        .as("avgdl")
    )
    val tf = toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn(
        "c",
        log(
          lit(1) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
        ) * (col("tf") * (lit(k1) + lit(1))) /
          (col("tf") +
            lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / col("avgdl")))
      )
    val scores = contrib
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c").cast(DecimalType(38, 20))).cast("double").as("score")
      )
      .select(col("doc_id"), round(col("score"), 6).as("score"))
    scores
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn(
        "rnk",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long")
      )
  }

  /** RM3 pseudo-relevance feedback (Lavrenko–Croft 2001 relevance models
    * with the Abdul-Jaleel 2004 RM3 interpolation — the classic query
    * expansion every Indri/Galago/Anserini stack ships): round 1 runs
    * [[bm25]], the top `kFb` documents vote expansion terms by
    * p(t) = Σ_d tf(t,d)/dl(d) (each feedback doc's unigram LM mass),
    * the top `mExp` non-query terms (p desc, term asc — p rounded to 6
    * BEFORE ranking, the engine's convention) re-enter the query with
    * weight (1−α)·p̂(t), original terms keep α/|Q|, and round 2 scores
    * weighted BM25. Every accumulation decimal-routed: p sums, the
    * expansion-mass normalizer Σp̂ (summed as exact 6-scale decimals, so
    * the driver-side literal equals the SQL replay bit for bit), and
    * both rounds' per-doc score sums.
    *
    * Driver state: the `mExp` (term, weight) rows — the k-row selection
    * budget. Both retrieval rounds are the [[bm25]] postings shape:
    * query-filtered before any shuffle, broadcast df/stats, TakeOrdered
    * head.
    */
  def rm3(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      kFb: Int = 10,
      mExp: Int = 5,
      alpha: Double = 0.6,
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 20
  ): DataFrame = {
    val (expansion, pSum) =
      rm3Expansion(docs, idCol, textCol, terms, kFb, mExp, k1, b)
    bm25Weighted(docs, idCol, textCol,
      rm3Weights(terms, expansion, pSum, alpha), k1, b, k)
  }

  /** The RM3 α-operating curve — retrieval's tuning knob measured the
    * way the ANN families measure theirs (IVF nprobe, HNSW ef, RP-tree
    * spill, LSH radius): the feedback round and the expansion-term
    * selection run ONCE (they are α-independent), and so does the
    * corpus-sized round-2 work — the term set is the SAME for every α
    * (only the weights move), so the unweighted per-(doc, term) BM25
    * contribution table is computed once and each α is a broadcast
    * weight join + decimal sum + top-k over it, never another corpus
    * tokenization. Scores multiply `c0 * wt` (the α-independent factor
    * first); the query oracle mirrors that order exactly. Returns
    * (alpha, doc_id, score, rnk).
    */
  def rm3Curve(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      alphas: Seq[Double],
      kFb: Int = 10,
      mExp: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 20
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(alphas.nonEmpty)
    val spark = docs.sparkSession
    import spark.implicits._
    val (expansion, pSum) =
      rm3Expansion(docs, idCol, textCol, terms, kFb, mExp, k1, b)
    // the term set is α-independent (weights differ, terms don't)
    val allTerms = rm3Weights(terms, expansion, pSum, alphas.head).map(_._1)
    val toks = docs.select(
      col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl").cast(DecimalType(30, 6))).cast("double") / count(lit(1)))
        .as("avgdl"))
    val tf = toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(allTerms.distinct: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // α-independent BM25 factor per (doc, term): idf × tf-saturation —
    // materialized once (≤ |docs|·|terms| rows, query-filtered before
    // any shuffle); every α below re-reads this table, not the corpus
    val c0 = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(
        col("doc_id"), col("term"),
        (log(lit(1) +
          (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + lit(1))) /
          (col("tf") +
            lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
          .as("c0"))
      .localCheckpoint()
    alphas
      .map { a =>
        val wt = rm3Weights(terms, expansion, pSum, a).toDF("term", "wt")
        c0.join(broadcast(wt), "term")
          .groupBy(col("doc_id"))
          .agg(sum((col("c0") * col("wt")).cast(DecimalType(38, 20)))
            .cast("double").as("score"))
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(k)
          .withColumn("rnk",
            row_number()
              .over(Window.orderBy(col("score").desc, col("doc_id")))
              .cast("long"))
          .select(lit(a).as("alpha"), col("doc_id"), col("score"),
            col("rnk"))
      }
      .reduce(_.unionByName(_))
  }

  private def rm3Weights(
      terms: Seq[String],
      expansion: Array[(String, Double)],
      pSum: Double,
      alpha: Double
  ): Seq[(String, Double)] = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    // dedup BEFORE dividing: dividing by terms.length but emitting
    // terms.distinct would shrink total original-term mass below alpha
    // whenever the query repeats a term
    val qs = terms.distinct
    val wq = alpha / qs.length
    qs.map(t => t -> wq) ++
      expansion.map { case (t, p) => t -> (1.0 - alpha) * (p / pSum) }
  }

  /** The α-independent half of RM3: round-1 feedback docs, the top-mExp
    * expansion terms (p desc, term asc; p 6-rounded BEFORE ranking),
    * and the exact scale-6 decimal normalizer (matches the SQL replay's
    * sum(p::DECIMAL(18,6)) regardless of accumulation order).
    */
  private def rm3Expansion(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      kFb: Int,
      mExp: Int,
      k1: Double,
      b: Double
  ): (Array[(String, Double)], Double) = {
    require(terms.nonEmpty && kFb >= 1 && mExp >= 1)
    val fbIds = bm25(docs, idCol, textCol, terms, k1, b, kFb)
      .select(col("doc_id"))
    val fbToks = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .join(fbIds, Seq("doc_id"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
    val expansion = fbToks
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .filter(!col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(
        sum((col("tf").cast("double") / col("dl"))
          .cast(DecimalType(38, 20))).cast("double").as("p"))
      .select(col("term"), round(col("p"), 6).as("p"))
      .orderBy(col("p").desc, col("term"))
      .limit(mExp)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val pSum = expansion
      .map { case (_, p) =>
        BigDecimal(p).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      }
      .sum.toDouble
    (expansion, pSum)
  }

  /** Weighted-term BM25: each term's contribution scales by its query
    * weight — the round-2 scorer of [[rm3]] (and any weighted-query
    * retrieval). Identical postings shape to [[bm25]].
    */
  def bm25Weighted(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weighted: Seq[(String, Double)],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 20
  ): DataFrame = {
    require(weighted.nonEmpty, "empty weighted query")
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = weighted.map(_._1)
    val toks = docs.select(
      col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl").cast(DecimalType(30, 6))).cast("double") / count(lit(1)))
        .as("avgdl"))
    val wt = weighted.toDF("term", "wt")
    val tf = toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(wt), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn(
        "c",
        col("wt") *
          log(lit(1) +
            (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + lit(1))) /
          (col("tf") +
            lit(k1) * (lit(1) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    contrib
      .groupBy(col("doc_id"))
      .agg(sum(col("c").cast(DecimalType(38, 20))).cast("double").as("score"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rnk",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2004) —
    * the language-modeling retrieval scorer next to [[bm25]]'s
    * probabilistic one (the two classical lexical families):
    *
    *   score(q, d) = Σ_{t∈q} ln( (tf(t,d) + μ·p(t|C)) / (dl + μ) ),
    *   p(t|C) = cf(t) / |C|
    *
    * Every document scores (absent terms contribute the smoothed
    * background mass — that is the point of Dirichlet smoothing), so the
    * contribution table is |corpus| × |terms| rows: the dl table cross
    * joins the BROADCAST ≤|terms|-row term-stats table and left-joins
    * the query-filtered postings — one streaming pass, nothing
    * proportional to corpus × vocabulary. ln acts on identical doubles
    * on both engines (exact-integer ratios + the μ literal), the
    * per-doc sum routes through DECIMAL(38,20), the score rounds to 6
    * places BEFORE ranking (the [[bm25]] convention), ties on doc_id.
    * Query terms absent from the whole collection are dropped (their
    * p(t|C) = 0 would send every document to −∞ equally).
    */
  def queryLikelihood(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      mu: Double = 100.0,
      k: Int = 20
  ): DataFrame = {
    require(terms.nonEmpty, "empty query")
    require(mu > 0, s"Dirichlet mu must be > 0, got $mu")
    val toks = docs.select(
      col(idCol).as("doc_id"),
      split(col(textCol), " ").as("t")
    )
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val ctot = dl.agg(sum(col("dl")).as("ctot"))
    val tf = toks
      .select(col("doc_id"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val contrib = dl
      .crossJoin(broadcast(cf.crossJoin(ctot)))
      .join(tf, Seq("doc_id", "term"), "left")
      .withColumn(
        "c",
        log(
          (coalesce(col("tf"), lit(0L)) +
            lit(mu) * (col("cf").cast("double") / col("ctot"))) /
            (col("dl") + lit(mu))))
    val scores = contrib
      .groupBy(col("doc_id"))
      .agg(sum(col("c").cast(DecimalType(38, 20))).cast("double").as("score"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
    scores
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn(
        "rnk",
        row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long")
      )
  }

  /** Row-local spelling of [[queryLikelihood]]'s per-document score
    * under FROZEN collection statistics (cf per term + |C|) — the
    * standing-query scorer: route arriving documents by relevance to a
    * fixed query without touching the corpus. Per row: tf per term from
    * the token array, the same ln((tf + μ·cf/|C|)/(dl + μ)) contribution,
    * decimal-routed fold in term-list order — exact, so batch and stream
    * agree bit-for-bit on every document's score (StreamingSpec pins
    * it). Zero shuffle, zero state.
    */
  def queryLikelihoodRow(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      cf: Map[String, Long],
      ctot: Long,
      mu: Double = 100.0
  ): DataFrame = {
    require(terms.nonEmpty, "empty query")
    require(ctot > 0, "empty collection stats")
    val toks = split(col(textCol), " ")
    val dl = size(toks).cast("long")
    // contribs cast to scale-20 decimals at precision 30, NOT 38: decimal
    // addition then GROWS precision ((30,20)+(30,20) → (31,20)) instead
    // of rounding the last scale digit — the fold is exact at scale 20,
    // bit-equal to the batch sum(DECIMAL(38,20)) of the same values
    val contribs: Seq[org.apache.spark.sql.Column] = terms
      .filter(t => cf.getOrElse(t, 0L) > 0L)
      .map { t =>
        val tf = size(filter(toks, x => x === t)).cast("long")
        log(
          (tf + lit(mu) * (lit(cf(t)).cast("double") / lit(ctot))) /
            (dl + lit(mu)))
          .cast(DecimalType(30, 20))
      }
    docs.select(
      col(idCol).as("doc_id"),
      round(contribs.reduce(_ + _).cast("double"), 6).as("score"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of the
    * BM25 lexical ranking with an exact-vector ranking of the SAME corpus
    * (doc ids align with embedding ids). RRF needs only the two rank
    * columns — fused(d) = Σ_lists 1/(rrfK + rank_list(d)) — so it is
    * score-scale-free, the standard first fusion for lexical+dense search.
    *
    * Shape at scale: each side is already a bounded top-kEach table (BM25's
    * TakeOrdered head; the vector side is a scan + bounded-heap top-k
    * against a plan-embedded literal query — no join at all), so the fusion
    * is a full-outer join of two ≤kEach-row tables: driver-trivial,
    * independent of corpus size. Fused score is a sum of exact small-int
    * rationals evaluated identically in any engine — no float hazard.
    */
  /** General N-list reciprocal-rank fusion: each input is a NAMED
    * bounded ranking (doc_id, rnk); fused(d) = Σ_lists 1/(rrfK + rank).
    * Score-scale-free (only ranks enter), so any mix of scorers fuses —
    * the engine's retrieval stack feeds it BM25, query-likelihood and
    * the dense ranking at once. The fold adds the per-list rationals in
    * list order (both engines spell the same chain); the join is a
    * full-outer chain of ≤kEach-row tables — driver-trivial, corpus-
    * independent. Output carries each list's rank column as
    * `<name>_rnk`.
    */
  def rrfFuse(
      lists: Seq[(String, DataFrame)], // (name, (doc_id, rnk))
      k: Int = 10,
      rrfK: Int = 60
  ): DataFrame = {
    require(lists.size >= 2, "rrfFuse needs at least two rankings")
    val tagged = lists.map { case (nm, df) =>
      df.select(col("doc_id"), col("rnk").cast("long").as(s"${nm}_rnk"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val fused = lists
      .map { case (nm, _) =>
        coalesce(lit(1.0) / (lit(rrfK) + col(s"${nm}_rnk")), lit(0.0))
      }
      .reduce(_ + _)
    val rankCols = lists.map { case (nm, _) => col(s"${nm}_rnk") }
    joined
      .withColumn("fused", fused)
      .orderBy(col("fused").desc, col("doc_id"))
      .limit(k)
      .select(
        Seq(col("doc_id"), round(col("fused"), 6).as("rrf_score")) ++
          rankCols :+
          row_number()
            .over(Window.orderBy(col("fused").desc, col("doc_id")))
            .cast("long")
            .as("rnk"): _*)
  }

  /** CombSUM / CombMNZ score fusion (Fox & Shaw, TREC-2 1994) — the
    * score-based complement of rank-only [[rrfFuse]]: each list's
    * top-kEach scores are min-max normalized WITHIN the list (the
    * standard Comb preprocessing; a degenerate constant list normalizes
    * to 0), CombSUM = Σ normalized scores over the lists containing the
    * doc, CombMNZ = CombSUM · (number of containing lists) — MNZ's
    * multiply-by-nonzero boost for multi-list agreement. Inputs must
    * carry pre-rounded scores (every producer here rounds to 6dp), so
    * the normalization is identical double arithmetic in both engines;
    * the cross-list sum is DECIMAL(38,20)-routed (order-free) and MNZ
    * is one exact integer multiply on top. Scale shape identical to
    * rrfFuse: a union of ≤kEach-row score slices, one tiny aggregate.
    */
  def combFuse(
      lists: Seq[(String, DataFrame)], // (name, (doc_id, score)) slices
      k: Int = 10
  ): DataFrame = {
    require(lists.size >= 2, "combFuse needs at least two score lists")
    val normed = lists.map { case (_, df) =>
      val mm = df.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
      df.crossJoin(broadcast(mm))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          when(col("hi") > col("lo"),
            (col("score") - col("lo")) / (col("hi") - col("lo")))
            .otherwise(lit(0.0)).as("norm"))
    }
    normed
      .reduce(_.unionByName(_))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("norm").cast(DecimalType(38, 20))).cast("double")
          .as("comb_sum"),
        count(lit(1)).as("n_lists"))
      .withColumn("comb_mnz", col("comb_sum") * col("n_lists"))
      // rank on the UNROUNDED fused value (the window runs before the
      // rounding projection — same layering as the SQL oracle), then
      // round the reported scores
      .withColumn("rnk",
        row_number()
          .over(Window.orderBy(col("comb_mnz").desc, col("doc_id")))
          .cast("long"))
      .filter(col("rnk") <= k)
      .select(
        col("doc_id"),
        round(col("comb_sum"), 6).as("comb_sum"),
        round(col("comb_mnz"), 6).as("comb_mnz"),
        col("n_lists"),
        col("rnk"))
  }

  /** The dense top-kEach ranking against one literal query vector — the
    * vector side [[hybridRrf]] and the 3-way fusion share: a scan +
    * bounded TakeOrdered head against a plan-embedded literal, no join.
    */
  def vectorRanking(
      emb: DataFrame,
      vecIdCol: String,
      vecCol: String,
      queryVec: Array[Double],
      kEach: Int
  ): DataFrame = {
    import graft.functions.VectorExpressions.l2SqFast
    emb
      .select(
        col(vecIdCol).cast("long").as("doc_id"),
        l2SqFast(col(vecCol), typedLit(queryVec.toSeq)).as("dist"))
      .orderBy(col("dist"), col("doc_id"))
      .limit(kEach)
      .select(
        col("doc_id"),
        row_number()
          .over(Window.orderBy(col("dist"), col("doc_id")))
          .cast("long")
          .as("rnk"))
  }

  def hybridRrf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      emb: DataFrame,
      vecIdCol: String,
      vecCol: String,
      queryVec: Array[Double],
      kEach: Int = 20,
      k: Int = 10,
      rrfK: Int = 60,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    import graft.functions.VectorExpressions.l2SqFast
    val lex = bm25(docs, idCol, textCol, terms, k1, b, kEach)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
    val vec = emb
      .select(
        col(vecIdCol).cast("long").as("doc_id"),
        l2SqFast(col(vecCol), typedLit(queryVec.toSeq)).as("dist")
      )
      .orderBy(col("dist"), col("doc_id"))
      .limit(kEach)
      .select(
        col("doc_id"),
        row_number()
          .over(Window.orderBy(col("dist"), col("doc_id")))
          .cast("long")
          .as("vec_rnk")
      )
    lex
      .join(vec, Seq("doc_id"), "full_outer")
      .withColumn(
        "fused",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rnk")), lit(0.0))
      )
      .orderBy(col("fused").desc, col("doc_id"))
      .limit(k)
      .select(
        col("doc_id"),
        round(col("fused"), 6).as("rrf_score"),
        col("lex_rnk"),
        col("vec_rnk"),
        row_number()
          .over(Window.orderBy(col("fused").desc, col("doc_id")))
          .cast("long")
          .as("rnk")
      )
  }
}
