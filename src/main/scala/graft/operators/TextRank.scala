package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004) — unsupervised
  * keyword salience as PageRank centrality over the word co-occurrence
  * graph, the graph-walk complement of tf-idf's counting signal: a word
  * matters when it co-occurs with many words that themselves matter.
  * Composes two shipped operators end-to-end: the co-occurrence edge
  * builder here feeds [[PageRank.pageRank]] unchanged (same damping,
  * same decimal-exact round arithmetic, same dangling-mass convention),
  * so the whole fixed-round schedule replays as unrolled SQL rounds and
  * hash-checks.
  *
  * Graph construction (the paper's, over the FILTERED token sequence —
  * the common implementation convention): candidate words are tokens of
  * length ≥ `minLen` whose corpus frequency is ≥ `minCount`; an
  * undirected edge links two distinct candidates that appear within
  * `window` positions of each other in a document's candidate sequence.
  * Edges are unweighted and deduplicated (the original formulation).
  * Word nodes enter the rank computation as 56-bit md5-prefix ids (the
  * `Dedup.hash56` spelling — engine-portable, and a collision merges the
  * same two words in both engines, so the hash check is unaffected).
  *
  * Scale shape: tokenize+filter is one linear scan; the vocabulary
  * filter is one hash aggregation on word types (bounded output); edge
  * generation is `window` lead() columns under a per-document sort —
  * linear in tokens, no self-join, no shuffle beyond the doc partition;
  * the rank loop is [[PageRank]]'s linear-per-round edge join. Nothing
  * is quadratic in corpus size; the graph is vocabulary-sized.
  */
object TextRank {

  /** Word → 56-bit id (Dedup.scala's md5-prefix spelling; DuckDB twin:
    * `('0x' || substr(md5(w), 1, 14))::BIGINT`).
    */
  private def wid(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** (doc_id, pos, w) candidate-token stream + the kept vocabulary.
    * pos is the 0-based position in the ORIGINAL token sequence (so the
    * co-occurrence window is measured over candidate adjacency after
    * filtering, the convention stated in the scaladoc above).
    */
  private def candidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long,
      minLen: Int
  ): (DataFrame, DataFrame) = {
    val toks = df
      .select(
        col(idCol).cast("long").as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
      .filter(col("w") =!= "" && length(col("w")) >= minLen)
    val vocab = toks
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select(col("w"))
    (toks.join(vocab, "w").select(col("doc_id"), col("pos"), col("w")), vocab)
  }

  /** The undirected co-occurrence edge set as (src, dst) 56-bit word
    * ids — directed duplicates and self-loops removed here; PageRank
    * re-undirects idempotently.
    */
  def cooccurrenceEdges(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      minCount: Long,
      minLen: Int
  ): DataFrame = {
    val (kept, _) = candidates(df, idCol, textCol, minCount, minLen)
    edgesFromKept(kept, window)
  }

  private def edgesFromKept(kept: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"co-occurrence window must be >= 1, got $window")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    (1 to window)
      .map(d => kept.select(col("w").as("a"), lead(col("w"), d).over(byPos).as("b")))
      .reduce(_ unionAll _)
      .filter(col("b").isNotNull && col("a") =!= col("b"))
      .select(wid(col("a")).as("src"), wid(col("b")).as("dst"))
      .distinct()
  }

  /** Top-`topK` keywords by TextRank score: (rank, word, pr), ranked on
    * the UNROUNDED rank values (identical doubles on both engines by
    * PageRank's decimal discipline), ties broken by word; pr rounded to
    * 6 places in the final select only.
    */
  def keywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 2,
      minCount: Long = 5,
      minLen: Int = 3,
      rounds: Int = 3,
      topK: Int = 100
  ): DataFrame = {
    val (kept, vocab) = candidates(df, idCol, textCol, minCount, minLen)
    val nodes = vocab
      .select(wid(col("w")).as("id"), col("w"))
      .localCheckpoint() // reused: rank universe + the word join-back
    val edges = edgesFromKept(kept, window) // ONE tokenize pass feeds both
    val pr = PageRank.pageRank(edges, nodes.select(col("id")), rounds)
    // TakeOrdered-first (the BM25 shape, TextSearch.bm25): orderBy+limit
    // compiles to TakeOrderedAndProject — a distributed per-partition
    // top-K + driver merge of ≤topK rows per partition — so the window
    // that numbers the ranks only ever sees ≤topK rows, never the
    // vocab-sized table on one partition.
    pr.join(nodes, "id")
      .orderBy(col("pr").desc, col("w").asc)
      .limit(topK)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("pr").desc, col("w").asc)))
      .select(
        col("rank").cast("long").as("rank"),
        col("w").as("word"),
        round(col("pr"), 6).as("pr"))
  }

  /** Per-document keyword salience under a FROZEN keyword table (word →
    * 6-dp pr from [[keywords]]): the serving half — Σ pr over the
    * document's token INSTANCES that hit the table (multiplicity
    * counts). The repo's all-integer discipline: each weight becomes a
    * micro-unit LONG (round(pr·10⁶) — pr is already 6-dp, so this is
    * its exact integer spelling), the per-document sum is exact integer
    * arithmetic in any order on any engine, and ONE final division by
    * 10⁶ produces the double. Row-local (one map lookup per token),
    * zero shuffle — the same expression serves the streaming twin
    * verbatim.
    */
  def salience(
      df: DataFrame,
      idCol: String,
      textCol: String,
      keywords: Map[String, Double]
  ): DataFrame = {
    val micro = keywords.map { case (w, p) => w -> math.round(p * 1e6) }
    val kw = typedLit(micro)
    val toks = TextAnalysis.tokens(col(textCol))
    df.select(
      col(idCol).cast("long").as("doc_id"),
      size(filter(toks, t => kw(t).isNotNull)).cast("long").as("n_key_hits"),
      (aggregate(toks, lit(0L), (acc, t) => acc + coalesce(kw(t), lit(0L)))
        .cast("double") / 1e6).as("salience"))
  }
}
