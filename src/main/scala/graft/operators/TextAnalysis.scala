package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2 D11 +
  * LLM-pipeline extension surface): token statistics, quality scoring,
  * profile-based language identification, and polynomial document
  * fingerprinting. Everything is a per-row map or a partial+final hash
  * aggregation — no operator here shuffles more than (token, count) pairs.
  */
object TextAnalysis {

  private val P = 1000000007L

  /** Fixed stopword list used by the quality score (engine-portable —
    * mirrored literally in the oracle SQL).
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "for")

  def tokens(textCol: Column): Column = split(textCol, " ")

  /** Per-document token statistics: token count, distinct count, average
    * token length (exact integer sums, divided once).
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        (expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))")
          .cast("double") / size(col("toks"))).as("avg_token_len")
      )

  /** Engine-portable PII patterns (no lookaround, no backreferences — the
    * same constructs Java regex and RE2 interpret identically, like
    * [[BpeTokenPattern]]).
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII detection + redaction, the pre-training scrub pass: per-document
    * match counts for emails and phone numbers, plus the md5 of the
    * redacted text (emails → `<EMAIL>` first, then phones → `<PHONE>`).
    * Pure per-row map — zero shuffle, embarrassingly parallel at any
    * corpus size; the hash keeps the full redacted body out of the result
    * while still pinning it byte-exactly.
    */
  def piiStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("txt"), lit(EmailPattern), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("txt"), lit(PhonePattern), lit(0)))
          .cast("long").as("n_phones"),
        md5(
          regexp_replace(
            regexp_replace(col("txt"), lit(EmailPattern), lit("<EMAIL>")),
            lit(PhonePattern), lit("<PHONE>"))
        ).as("redacted_md5")
      )

  /** GPT-2-flavored pretokenization pattern, restricted to constructs with
    * identical semantics in Java regex (Spark) and RE2 (DuckDB) — no
    * lookarounds, no unicode classes: an optional leading space glued to a
    * letter run, a digit run, or a punctuation run. This is the BPE
    * *pre*-tokenizer shape (the merge table is a model artifact, not an
    * engine operator); token counts under it are the standard LLM-pipeline
    * length statistic.
    */
  val BpeTokenPattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Per-document BPE-ish token statistics: total token count, letter-run
    * and digit-run counts, and mean token length (leading spaces counted,
    * as in BPE vocabularies).
    */
  def bpeTokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol).as("doc_id"),
        regexp_extract_all(
          col(textCol), lit(s"($BpeTokenPattern)"), lit(1)).as("toks")
      )
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("size(filter(toks, t -> trim(t) rlike '^[A-Za-z]+$'))")
          .cast("long").as("n_word_tokens"),
        expr("size(filter(toks, t -> trim(t) rlike '^[0-9]+$'))")
          .cast("long").as("n_digit_tokens"),
        round(
          expr("aggregate(toks, 0L, (a, t) -> a + length(t))").cast("double")
            / expr("nullif(size(toks), 0)"),
          6
        ).as("avg_token_len")
      )

  /** A C4 line-keep predicate over one line column: at least `minWords`
    * whitespace words AND a terminal-punctuation ending (. ! ? ") —
    * Raffel et al. 2020 §2.2's "retained only lines that ended in a
    * terminal punctuation mark" + "at least 3 words".
    */
  private def c4LineKept(l: Column, minWords: Int): Column =
    (size(filter(split(l, " "), w => w =!= "")) >= minWords) &&
      substring(l, -1, 1).isin(".", "!", "?", "\"")

  /** C4-style heuristic page filters (Raffel et al. 2020 §2.2 — the
    * cleaning pass behind the C4 corpus, kept by every successor
    * pipeline up to FineWeb): per-page line census under the line-keep
    * rule ([[c4LineKept]]), the page-level placeholder/code flags
    * ("lorem ipsum" anywhere → boilerplate placeholder page; `{`
    * anywhere → likely source code), and the page keep decision
    * keep = kept_lines ≥ minKeptLines AND neither flag (C4 discards
    * flagged pages wholesale; the line rule trims the rest — the
    * rewrite half is [[c4Scrub]]).
    *
    * Returns (doc_id, n_lines, n_kept, kept_frac, has_lorem, has_brace,
    * keep). Pure per-row HOF arithmetic over `split(text, '\n')`: zero
    * shuffle, zero UDF — at corpus scale this streams through the
    * codegen'd filters at parquet-scan speed, the cheapest stage a
    * pipeline has.
    */
  def c4Stats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 3,
      minKeptLines: Int = 3
  ): DataFrame =
    df.select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("lines"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn(
        "n_kept",
        size(filter(col("lines"), l => c4LineKept(l, minWords))).cast("long"))
      .withColumn(
        "has_lorem",
        exists(col("lines"), l => lower(l).contains("lorem ipsum")))
      .withColumn("has_brace", exists(col("lines"), l => l.contains("{")))
      .select(
        col("doc_id"),
        col("n_lines"),
        col("n_kept"),
        round(col("n_kept").cast("double") / col("n_lines"), 6)
          .as("kept_frac"),
        col("has_lorem"),
        col("has_brace"),
        (col("n_kept") >= minKeptLines && !col("has_lorem") &&
          !col("has_brace")).as("keep")
      )

  /** The rewrite half of [[c4Stats]]: pages that survive the page-level
    * flags keep only their [[c4LineKept]] lines, reassembled with the
    * newline preserved; flagged pages are dropped entirely. Returns
    * (doc_id, clean_text, n_dropped_lines) for surviving pages only —
    * the same per-row zero-shuffle shape as the stats pass.
    */
  def c4Scrub(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 3,
      minKeptLines: Int = 3
  ): DataFrame =
    df.select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("lines"))
      .withColumn(
        "has_flag",
        exists(
          col("lines"),
          l => lower(l).contains("lorem ipsum") || l.contains("{")))
      .withColumn("kept", filter(col("lines"), l => c4LineKept(l, minWords)))
      .filter(!col("has_flag") && size(col("kept")) >= minKeptLines)
      .select(
        col("doc_id"),
        array_join(col("kept"), "\n").as("clean_text"),
        (size(col("lines")) - size(col("kept"))).cast("long")
          .as("n_dropped_lines")
      )

  /** Heuristic quality score in [0,1]: blend of length saturation,
    * stopword ratio and token diversity. The exact formula is part of the
    * declared semantics (mirrored in the oracle SQL).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")).cast("double"))
      .withColumn(
        "stop_ratio",
        expr(s"size(filter(toks, x -> x IN ($stopList)))").cast("double")
          / col("n")
      )
      .withColumn(
        "diversity",
        size(array_distinct(col("toks"))).cast("double") / col("n")
      )
      .withColumn("len_sat", least(lit(1.0), col("n") / 50.0))
      .select(
        col("doc_id"),
        round(
          lit(0.4) * col("len_sat") + lit(0.3) * col("stop_ratio")
            + lit(0.3) * col("diversity"),
          6
        ).as("quality")
      )
  }

  /** Repetition statistics (the Gopher-rule family): how much of a
    * document is the same thing said again. Two signals per doc:
    *   - top_bigram_frac: fraction of tokens covered by the single most
    *     frequent bigram (2 · max bigram count / n_tokens),
    *   - dup_trigram_frac: fraction of trigram OCCURRENCES that are
    *     repeats (1 − distinct/total).
    * Docs too short for a bigram/trigram score 0 on that signal.
    *
    * Shape at scale: n-grams explode to (doc, gram) rows and reduce in two
    * hash aggregations with map-side partial combine — the shuffle carries
    * (doc, gram, count), never document text, and nothing is held per-doc
    * in memory (a pathological 1-GiB document is fine).
    */
  def repetitionStats(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    def grams(n: Int): Column = explode(
      expr(
        s"transform(sequence(0, size(t)-$n), i -> " +
          (0 until n).map(j => s"t[i+$j]").mkString("concat_ws(' ', ", ", ", ")") + ")"
      )
    )
    val topBigram = toks
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), grams(2).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"))
    val triDup = toks
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), grams(3).as("g"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("total"),
        countDistinct(col("g")).as("dist")
      )
    toks
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(topBigram, Seq("doc_id"), "left")
      .join(triDup, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(
          coalesce(
            lit(2.0) * col("top_c") / col("n_tokens"), lit(0.0)), 6
        ).as("top_bigram_frac"),
        round(
          coalesce(
            lit(1.0) - col("dist").cast("double") / col("total"), lit(0.0)), 6
        ).as("dup_trigram_frac")
      )
  }

  /** Profile-based language ID: fit = top-`profileSize` tokens per labeled
    * language (count desc, token asc); predict = the language whose profile
    * overlaps the document's tokens most (ties -> lexicographically first
    * language). A naive-Bayes-flavored n-gram classifier reduced to two
    * joins + two rank windows.
    */
  def langId(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      profileSize: Int = 20
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT cached: the exploded token table is larger than the corpus, so
    // materializing it in executor storage is exactly wrong at scale — the
    // two consumers (profile fit, match join) each re-scan the source, and
    // the storage footprint stays zero for a long-lived session
    val tok = df.select(
      col(idCol).as("doc_id"),
      col(langCol).as("lang"),
      explode(tokens(col(textCol))).as("w")
    )
    val prof = tok
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
    val wProf = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("w"))
    val top = prof
      .withColumn("rn", row_number().over(wProf))
      .filter(col("rn") <= profileSize)
      .select(col("lang").as("plang"), col("w"))
    // `top` is <= |langs| * profileSize rows, and its join keys are by
    // construction the corpus's hottest tokens — an unhinted shuffle join
    // would put maximal skew on the exchange, so broadcast explicitly
    val score = tok
      .join(broadcast(top), "w")
      .groupBy(col("doc_id"), col("plang"))
      .agg(count(lit(1)).as("s"))
    val wPred = Window.partitionBy(col("doc_id")).orderBy(col("s").desc, col("plang"))
    val pred = score
      .withColumn("rn", row_number().over(wPred))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("predicted"))
    df.select(col(idCol).as("doc_id"), col(langCol).as("actual"))
      .join(pred, Seq("doc_id"), "left")
      .withColumn("predicted", coalesce(col("predicted"), lit("??")))
  }

  /** Bigram-LM perplexity scoring — the CCNet-style quality signal: train
    * an add-½-smoothed bigram language model ON THE CORPUS ITSELF, then
    * score every document by its per-token negative log-likelihood and
    * perplexity (high perplexity = the doc reads unlike the corpus; the
    * classic pre-training filter ranks or drops by this number).
    *
    * Model: P(w₂|w₁) = (c(w₁w₂) + ½) / (c(w₁·) + ½·V), with c(w₁·) the
    * bigram-PREFIX count (so conditionals sum to 1 over the vocab) and V
    * the corpus unigram vocabulary size.
    *
    * Shape at scale: the (doc, w₁, w₂) position table is the only
    * corpus-sized relation; it joins the two count tables on their own
    * keys — equi-joins Spark shuffles on (w₁, w₂)/(w₁), never pairwise,
    * with V a 1-row broadcast. The per-doc mean routes the position NLLs
    * through a decimal sum, so it is exact under any partial-aggregation
    * order. Docs with fewer than 2 tokens score NULL (no bigrams).
    */
  def perplexity(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val bg = toks
      .filter(size(col("t")) >= 2)
      .select(
        col("doc_id"),
        explode(
          expr(
            "transform(sequence(0, size(t)-2)," +
              " i -> struct(t[i] AS w1, t[i+1] AS w2))"
          )
        ).as("p")
      )
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = toks
      .select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val nll = bg
      .join(cb, Seq("w1", "w2"))
      .join(cu, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn(
        "nll",
        -log(
          (col("cb") + lit(0.5)) / (col("cu") + lit(0.5) * col("v"))
        )
      )
    val perDoc = nll
      .groupBy(col("doc_id"))
      .agg(
        (sum(col("nll").cast(org.apache.spark.sql.types.DecimalType(38, 20)))
          .cast("double") / count(lit(1))).as("nll_per_tok")
      )
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        round(col("nll_per_tok"), 6).as("nll_per_tok"),
        round(exp(col("nll_per_tok")), 6).as("perplexity")
      )
  }

  /** Interpolated Kneser–Ney bigram perplexity (Chen & Goodman 1999 —
    * the smoothing the CCNet filter's KenLM models actually use, a rung
    * above [[perplexity]]'s add-½): the discounted bigram estimate backs
    * off to the CONTINUATION unigram — how many distinct contexts a word
    * follows, not how often it occurs — which is what separates
    * "Francisco" (frequent, one context) from genuinely productive words.
    *
    * Model, with absolute discount D:
    *   P(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·)
    *              + (D·N₁₊(w₁·)/c(w₁·)) · (N₁₊(·w₂)/N₁₊(··))
    * where N₁₊(w₁·)/N₁₊(·w₂) count distinct continuations/contexts and
    * N₁₊(··) is the bigram-type total. Self-scored on the training
    * corpus every scored bigram has c ≥ 1 > D, so the discounted term
    * never clips and every probability is strictly positive.
    *
    * Shape at scale: identical to [[perplexity]] — the (doc, w₁, w₂)
    * position table is the only corpus-sized relation, joined on its own
    * keys against the count tables (all derived from one bigram-type
    * aggregate); the type total is a 1-row broadcast; per-doc means are
    * decimal-routed. Docs with fewer than 2 tokens score NULL.
    */
  def perplexityKN(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75
  ): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val bg = toks
      .filter(size(col("t")) >= 2)
      .select(
        col("doc_id"),
        explode(
          expr(
            "transform(sequence(0, size(t)-2)," +
              " i -> struct(t[i] AS w1, t[i+1] AS w2))"
          )
        ).as("p")
      )
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    // continuation counts live on the bigram-TYPE table, not occurrences
    val n1r = cb.groupBy(col("w1")).agg(count(lit(1)).as("n1r"))
    val n1l = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1l"))
    val nbt = cb.agg(count(lit(1)).as("nbt"))
    val d = lit(discount)
    val nll = bg
      .join(cb, Seq("w1", "w2"))
      .join(cu, Seq("w1"))
      .join(n1r, Seq("w1"))
      .join(n1l, Seq("w2"))
      .crossJoin(broadcast(nbt))
      .withColumn(
        "nll",
        -log(
          (col("cb") - d) / col("cu") +
            ((d * col("n1r")) / col("cu")) *
            (col("n1l").cast("double") / col("nbt"))
        )
      )
    val perDoc = nll
      .groupBy(col("doc_id"))
      .agg(
        (sum(col("nll").cast(org.apache.spark.sql.types.DecimalType(38, 20)))
          .cast("double") / count(lit(1))).as("nll_per_tok")
      )
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        round(col("nll_per_tok"), 6).as("nll_per_tok"),
        round(exp(col("nll_per_tok")), 6).as("perplexity")
      )
  }

  /** fastText-style linear text classifier (Joulin et al. 2016 "Bag of
    * Tricks"): bag of word + word-bigram features through the hashing
    * trick, mean-pooled feature weights, sigmoid — the model family the
    * DCLM / FineWeb quality-filtering stages run over whole crawls. The
    * WEIGHTS are a declared deterministic stand-in (md5-derived per
    * feature, uniform in [-1, 1] at 0.001 resolution — a 2^56-bucket
    * hashing trick); the product is the PIPELINE SHAPE (feature hash →
    * weight lookup → mean pool → σ), and a trained weight table drops in
    * as a broadcast join without touching the plan.
    *
    * Exactness: weights are integer MILLIS, so the per-doc feature sum
    * is an exact long (no float-order dependence across engines or
    * partitions) and the keep decision (σ(x) ≥ 0.5 ⟺ wsum ≥ 0) is
    * integer-exact; only the reported score touches floating point.
    *
    * Scale: pure per-doc map work — one explode, one hash-keyed groupBy;
    * no corpus-wide state anywhere.
    */
  def linearClassifier(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
    val feats = toks
      .select(
        col("doc_id"),
        explode(
          concat(
            expr("transform(t, x -> concat('u:', x))"),
            when(
              size(col("t")) >= 2,
              expr(
                "transform(sequence(0, size(t)-2)," +
                  " i -> concat('b:', t[i], ' ', t[i+1]))")
            ).otherwise(array())
          )
        ).as("feat")
      )
    val wm = feats.select(
      col("doc_id"),
      (Dedup.md5Long(col("feat")) % 2001 - 1000).as("wm"))
    wm.groupBy(col("doc_id"))
      .agg(sum(col("wm")).as("wsum"), count(lit(1)).as("nfeat"))
      .select(
        col("doc_id"),
        col("wsum"),
        col("nfeat"),
        round(
          lit(1.0) / (lit(1.0) +
            exp(-(col("wsum").cast("double") / (lit(1000.0) * col("nfeat"))))),
          6
        ).as("score"),
        (col("wsum") >= 0).as("keep")
      )
  }

  /** Corpus drift census between two slices of one token stream:
    * add-one-smoothed unigram LMs over the SHARED vocabulary (union of
    * both slices), KL(A→B), KL(B→A), and the bounded symmetric
    * Jensen–Shannon divergence (Lin 1991; 0 ≤ JSD ≤ ln 2) — the
    * distribution-shift monitor run between crawl snapshots or
    * source mixes. `sliceA` is any deterministic boolean column over
    * the input rows (e.g. doc_id parity, a date cut, a source flag).
    *
    * Exactness: token counts are integers; pa/pb are single divisions
    * of exact integers (identical doubles on any engine); each
    * p·ln(p/q) term routes through DECIMAL(38,20) so the corpus sums
    * are order-free. Scale: ONE vocabulary-keyed aggregation with
    * map-side combine + a 1-row totals broadcast — no corpus-sized
    * state, no window.
    *
    * Returns one row: (n_a, n_b, vocab, kl_ab, kl_ba, jsd).
    */
  def klDrift(df: DataFrame, sliceA: Column, textCol: String): DataFrame =
    klDriftFromCounts(klDriftCounts(df, sliceA, textCol))

  /** The census's sufficient statistic: per-term (ca, cb) slice counts
    * — ONE vocabulary-keyed aggregation, valid on a batch frame AND as
    * an update-mode streaming aggregation (state = vocabulary-bounded,
    * counts only grow — the same bounded-state argument as the
    * streaming CMS).
    */
  def klDriftCounts(
      df: DataFrame, sliceA: Column, textCol: String): DataFrame =
    df.select(sliceA.as("ina"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(
        sum(when(col("ina"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("ina"), 1L).otherwise(0L)).as("cb"))

  /** Finishing arithmetic over a drained/batch (w, ca, cb) count table
    * — shared by the batch census and the streaming twin, so a drained
    * stream's census is bit-equal to the batch one.
    */
  def klDriftFromCounts(cnt: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tot = cnt.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    def d38(c: Column) = sum(c.cast(DecimalType(38, 20))).cast("double")
    cnt
      .crossJoin(tot)
      .withColumn("pa", (col("ca") + 1).cast("double") / (col("na") + col("v")))
      .withColumn("pb", (col("cb") + 1).cast("double") / (col("nb") + col("v")))
      .withColumn("pm", (col("pa") + col("pb")) / 2.0)
      .agg(
        max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("v")).as("vocab"),
        d38(col("pa") * log(col("pa") / col("pb"))).as("kl_ab"),
        d38(col("pb") * log(col("pb") / col("pa"))).as("kl_ba"),
        ((d38(col("pa") * log(col("pa") / col("pm")))
          + d38(col("pb") * log(col("pb") / col("pm")))) / 2.0).as("jsd"))
      .select(
        col("n_a"), col("n_b"), col("vocab"),
        round(col("kl_ab"), 6).as("kl_ab"),
        round(col("kl_ba"), 6).as("kl_ba"),
        round(col("jsd"), 6).as("jsd"))
  }

  /** Polynomial rolling fingerprint over the token stream:
    * `h = fold(tokens, 0, (acc, t) -> (31·acc + md5_56(t) mod P) mod P)` —
    * deterministic, order-sensitive, engine-portable (md5-derived token
    * hashes).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(
        col("doc_id"),
        expr(
          "aggregate(" +
            "transform(toks, t -> cast(conv(substring(md5(t), 1, 14), 16, 10) AS long) % " + P + "L), " +
            "0L, (acc, x) -> (acc * 31 + x) % " + P + "L)"
        ).as("fingerprint")
      )

  /** Zipf-law fit over the corpus token frequency distribution — the
    * one-row corpus-health diagnostic (natural text slopes ≈ −1; heavily
    * templated/duplicated or synthetic corpora drift off): least-squares
    * of ln(freq) on ln(rank) over the top `topN` token ranks. Returns
    * (n, slope, intercept).
    *
    * Scale: one corpus-sized token aggregation (map-side combined on the
    * vocabulary key), ranks from [[Packing.distributedRank]] (never a
    * one-partition window over the vocabulary), then a topN-row bounded
    * regression whose four sums route through DECIMAL(38,20) — exact,
    * order-insensitive, engine-portable.
    */
  def zipfFit(
      df: DataFrame,
      textCol: String,
      topN: Int = 100
  ): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tf = df
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
    val ranked = Packing
      .distributedRank(tf, Seq(col("c").desc, col("w")), "r")
      .filter(col("r") < topN)
      .select(
        log((col("r") + 1).cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    def dsum(c: Column) = sum(c.cast(DecimalType(38, 20))).cast("double")
    ranked
      .agg(
        count(lit(1)).as("n"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("y")).as("sxy"),
        dsum(col("x") * col("x")).as("sxx"))
      .select(
        col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        col("sx"), col("sy"))
      .select(
        col("n"),
        col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"))
  }

  /** Default frequency floor for the tokenizer-train word collects: words
    * seen fewer times are dropped BEFORE the driver collect. 1 = no floor
    * (keeps the published oracle trajectories byte-identical at test SFs).
    */
  final val DefaultMinWordCount: Long = 1L

  /** Default cap on the number of distinct words collected to the driver
    * by the tokenizer trainers (most-frequent-first). 2^22 ≈ 4.2M words ·
    * ~40 B ≈ 170 MB — comfortably driver-sized, far above any test-SF
    * vocabulary (no-op there), and the guard a 100-TB web corpus needs:
    * its 10^8–10^9 distinct "words" (typos, URLs, numbers) would
    * otherwise put tens of GB on the driver.
    */
  final val DefaultMaxVocabWords: Int = 1 << 22

  /** The ONE corpus-sized stage shared by all tokenizer trainers
    * ([[bpeMerges]], [[unigramTrain]], [[unigramPrune]],
    * [[wordPieceTrain]]): a distributed word→count hash aggregation,
    * map-side combined on vocabulary keys — followed by the BOUNDED
    * driver collect. Production trainers (sentencepiece, HF tokenizers)
    * apply exactly this discipline: a frequency floor plus a
    * most-frequent-first cap before any driver-side loop, so the
    * collected array is ≤ `maxVocabWords` entries regardless of corpus
    * size. Ties at the cap break lexicographically (deterministic).
    * Array order is (count desc, word) but every caller folds it into
    * order-independent sums, so results are insensitive to it.
    */
  def weightedWordCounts(
      df: DataFrame,
      textCol: String,
      minWordCount: Long = DefaultMinWordCount,
      maxVocabWords: Int = DefaultMaxVocabWords
  ): Array[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(minWordCount >= 1, s"minWordCount must be >= 1, got $minWordCount")
    require(maxVocabWords >= 1, s"maxVocabWords must be >= 1, got $maxVocabWords")
    df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minWordCount)
      .orderBy(col("c").desc, col("w")) // + limit => TakeOrdered, bounded per partition
      .limit(maxVocabWords)
      .as[(String, Long)]
      .collect()
  }

  /** BPE merge-rule training (Sennrich et al. 2016) over the corpus.
    *
    * The split follows how production tokenizer training actually scales:
    * the CORPUS-SIZED pass is one distributed hash aggregation — token →
    * weighted count (at 100 TB this is the only stage that touches the
    * data, map-side combined on vocabulary keys) — and the merge loop
    * then runs over the weighted vocabulary (bounded by |vocab|·maxLen,
    * millions of entries, not corpus-sized) on the driver, exactly where
    * HF/sentencepiece run it. Each round counts adjacent symbol pairs
    * weighted by word frequency, picks the most frequent (ties broken
    * lexicographically — fully deterministic), and rewrites the vocab.
    *
    * Returns the learned merge table (merge_rank, left, right,
    * pair_count) — the tokenizer artifact itself.
    */
  def bpeMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2,
      minWordCount: Long = DefaultMinWordCount,
      maxVocabWords: Int = DefaultMaxVocabWords
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wordCounts: Array[(String, Long)] =
      weightedWordCounts(df, textCol, minWordCount, maxVocabWords)
    // vocab as mutable symbol sequences, weighted by word frequency
    var vocab: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      val best = pairCounts.toSeq
        .filter(_._2 >= minPairCount)
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .headOption
      best match {
        case None => done = true
        case Some(((l, r), c)) =>
          merges += ((rank, l, r, c))
          val merged = l + r
          vocab = vocab.map { case (syms, wc) =>
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += merged; i += 2 // greedy left-to-right, no overlap
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, wc)
          }
          rank += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "left", "right", "pair_count")
  }

  /** Apply a learned merge table: tokenize each document's words with the
    * merges in rank order (each merge rewrites every non-overlapping
    * occurrence left-to-right, mirroring [[bpeMerges]]'s training
    * rewrite). The merge list is driver-small (numMerges rows) and ships
    * inside the task closure; the kernel runs embarrassingly parallel
    * per partition. Returns (doc_id, n_words, n_tokens, tokens_hash) —
    * the fingerprint keeps the full token stream checkable without
    * shipping it.
    */
  def bpeEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ms = merges.toArray
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var nTok = 0L
          var h = 0L
          words.foreach { w =>
            var syms = w.map(_.toString).toArray
            ms.foreach { case (l, r) =>
              if (syms.length > 1) {
                val out = scala.collection.mutable.ArrayBuffer[String]()
                var i = 0
                while (i < syms.length) {
                  if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                    out += (l + r); i += 2
                  } else { out += syms(i); i += 1 }
                }
                syms = out.toArray
              }
            }
            nTok += syms.length
            syms.foreach { s => h = (h * 31 + s.hashCode.toLong) % P }
          }
          (id, words.length.toLong, nTok, h)
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "tokens_hash")
  }

  /** PMI-ranked bigram collocations over the corpus token stream:
    * pointwise mutual information as the LIFT ratio
    * `p(xy) / (p(x)·p(y)) = c_xy·N² / (B·c_x·c_y)` (N tokens, B bigram
    * positions) — the log is monotone, so ranking by the ratio ranks by
    * PMI while keeping the score a deterministic double both engines
    * compute bit-identically from exact counts. Returns
    * (bigram, n_pair, lift) for bigrams seen ≥ minCount times.
    *
    * Scale: two hash aggregations (unigrams, bigrams) — both partial-agg
    * map-side combined on low-cardinality vocab keys — plus joins of the
    * bigram table against the broadcast-sized unigram table and the
    * 1-row totals. No per-doc state, no windows; linear in corpus tokens.
    */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5
  ): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
    val ucnt = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bg = toks
      .select(
        explode(
          when(
            size(col("t")) >= 2,
            expr("transform(sequence(0, size(t)-2), i -> concat_ws(' ', t[i], t[i+1]))")
          ).otherwise(array())
        ).as("bigram")
      )
    val bcnt = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
    val totals = uni
      .agg(count(lit(1)).as("n_tok"))
      .crossJoin(bg.agg(count(lit(1)).as("n_bg")))
    bcnt
      .filter(col("n_pair") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(ucnt.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(ucnt.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(totals))
      .select(
        col("bigram"),
        col("n_pair"),
        round(
          col("n_pair").cast("double") * col("n_tok") * col("n_tok") /
            (col("n_bg").cast("double") * col("c1") * col("c2")),
          6
        ).as("lift")
      )
  }

  /** Term-blocklist filter stage (the "bad words" / UT1-blocklist pass
    * of C4 §2.2 and FineWeb): per doc, occurrences of blocklisted terms
    * and the keep decision at `maxHitFrac`. Dictionary-JOIN shape, not
    * a per-doc dictionary scan: docs explode to per-(doc, token) counts
    * and hits arrive by an equi-join against the term table — at corpus
    * scale the blocklist is ~10⁴ rows, so Spark broadcasts it and the
    * stage is one scan + one per-doc aggregate; a 10⁶-term dictionary
    * would shuffle on token and still never scan terms per doc.
    * Case-insensitive on both sides.
    *
    * @param terms one column: the blocklisted terms
    * @return (doc_id, n_tokens, n_hits, n_terms, hit_frac, keep)
    */
  def blocklistStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: DataFrame,
      maxHitFrac: Double
  ): DataFrame = {
    val tok = df
      .select(
        col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("tok", lower(col("tok")))
    val tot = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
    val dict = broadcast(
      terms.select(lower(col(terms.columns.head)).as("tok")).distinct())
    val hits = tok
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .join(dict, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_hits"), count(lit(1)).as("n_terms"))
    tot
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        round(
          coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_tokens"),
          6).as("hit_frac"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_tokens")
          <= maxHitFrac).as("keep"))
  }

  /** Gopher quality rules (Rae et al. 2021, §A1.1.2) — the
    * document-level heuristic stack MassiveText shipped and later
    * corpora (RefinedWeb, Dolma) kept: word-count bounds, mean word
    * length band, symbol-to-word ratios (# and ellipsis), bullet-line
    * and ellipsis-line fractions, alphabetic-word fraction, and the
    * ≥2-distinct-stopwords requirement. Pure per-row column arithmetic
    * — integer counts and double ratios, zero shuffle, streams at scan
    * speed like the C4/FineWeb stacks.
    */
  def gopherStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    df.select(
        col(idCol).as("doc_id"),
        expr(s"filter(split($textCol, ' '), w -> w != '')").as("ws"),
        split(col(textCol), "\n").as("ls"),
        (length(col(textCol))
          - length(regexp_replace(col(textCol), "#", ""))).as("hashes"),
        ((length(col(textCol))
          - length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3)
          .as("ellipses")
      )
      .select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        expr("aggregate(ws, 0L, (a, w) -> a + length(w))").as("wchars"),
        col("hashes").cast("long").as("hashes"),
        col("ellipses").cast("long").as("ellipses"),
        size(col("ls")).cast("long").as("n_lines"),
        expr("size(filter(ls, l -> l rlike '^[-*•]'))")
          .cast("long").as("bullet_lines"),
        expr("size(filter(ls, l -> l rlike '\\\\.{3}$'))")
          .cast("long").as("ellipsis_lines"),
        expr("size(filter(ws, w -> w rlike '[A-Za-z]'))")
          .cast("long").as("alpha_words"),
        expr(s"size(filter(array(${stops.map("'" + _ + "'").mkString(",")}), " +
          s"s -> array_contains(transform(ws, w -> lower(w)), s)))")
          .cast("long").as("n_stop")
      )
      .select(
        col("doc_id"), col("n_words"),
        round(col("wchars").cast("double") / nullif(col("n_words"), lit(0L)), 6)
          .as("mean_word_len"),
        round(greatest(
          col("hashes").cast("double") / nullif(col("n_words"), lit(0L)),
          col("ellipses").cast("double") / nullif(col("n_words"), lit(0L))), 6)
          .as("symbol_ratio"),
        round(col("bullet_lines").cast("double")
          / nullif(col("n_lines"), lit(0L)), 6).as("bullet_frac"),
        round(col("ellipsis_lines").cast("double")
          / nullif(col("n_lines"), lit(0L)), 6).as("ellipsis_frac"),
        round(col("alpha_words").cast("double")
          / nullif(col("n_words"), lit(0L)), 6).as("alpha_frac"),
        col("n_stop"),
        (col("n_words").between(50L, 100000L) &&
          (col("wchars").cast("double") / nullif(col("n_words"), lit(0L)))
            .between(3.0, 10.0) &&
          (col("hashes").cast("double") / nullif(col("n_words"), lit(0L)))
            <= 0.1 &&
          (col("ellipses").cast("double") / nullif(col("n_words"), lit(0L)))
            <= 0.1 &&
          (col("bullet_lines").cast("double") / nullif(col("n_lines"), lit(0L)))
            <= 0.9 &&
          (col("ellipsis_lines").cast("double") / nullif(col("n_lines"), lit(0L)))
            <= 0.3 &&
          (col("alpha_words").cast("double") / nullif(col("n_words"), lit(0L)))
            >= 0.8 &&
          col("n_stop") >= 2L).as("keep")
      )
  }

  /** Tokenizer fertility audit per language: chars-per-token (how much
    * text one BPE-ish token carries) and tokens-per-word (fertility —
    * how many subword tokens a whitespace word splits into). The
    * standard multilingual-tokenizer health check: a language whose
    * fertility is 2-3× the corpus norm pays that multiple in sequence
    * length for the same content (Rust et al., ACL 2021). One scan,
    * integer sums (exact, order-free), one small groupBy(lang).
    */
  def tokenizerFertility(
      df: DataFrame,
      textCol: String,
      langCol: String
  ): DataFrame =
    df.select(
        col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("chars"),
        size(regexp_extract_all(
          col(textCol), lit(s"($BpeTokenPattern)"), lit(1)))
          .cast("long").as("toks"),
        expr(s"size(filter(split($textCol, ' '), w -> w != ''))")
          .cast("long").as("words")
      )
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("chars")).as("n_chars"),
        sum(col("toks")).as("n_tokens"),
        sum(col("words")).as("n_words"))
      .select(
        col("lang"),
        col("docs"),
        col("n_tokens"),
        round(col("n_chars").cast("double") /
          nullif(col("n_tokens"), lit(0L)), 6).as("chars_per_token"),
        round(col("n_tokens").cast("double") /
          nullif(col("n_words"), lit(0L)), 6).as("fertility")
      )

  /** Hashing-trick TF-IDF features (Weinberger et al. 2009 — the
    * fixed-width featurizer that needs NO vocabulary pass): token →
    * bucket = md5-long mod `numBuckets`, per-(doc, bucket) term counts,
    * idf = ln(N / df_bucket) over bucket document frequencies. The
    * vocabulary-free property is the 100-TB point: ONE hash aggregation
    * keyed on (doc, bucket) + one B-row idf table, no dictionary
    * broadcast, stable schema whatever the corpus. Feeds the spectral
    * tier (PCA/LSA over the fixed-width vectors) and any linear
    * classifier.
    *
    * @return (doc_id, bucket, tf, tfidf) — only occupied buckets emit
    */
  def hashedTfidf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 16
  ): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val n = df.select(count(lit(1)).as("n"))
    val tf = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        (graft.operators.Dedup.md5Long(col("w")) % numBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val dfb = tf.groupBy(col("bucket")).agg(count(lit(1)).as("dfb"))
    tf
      .join(broadcast(dfb), "bucket")
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("bucket"), col("tf"),
        (col("tf") * log(col("n").cast("double") / col("dfb"))).as("tfidf"))
  }

  /** Row-local spelling of the TF half of [[hashedTfidf]] under a
    * batch-frozen idf vector — the streaming featurizer (idf is corpus
    * state, so the stream serves a training-time snapshot, the
    * pcaOutlierStream discipline). Bit-equal tf/tfidf per row for the
    * same idf table.
    */
  def hashedTfidfRow(
      df: DataFrame,
      idCol: String,
      textCol: String,
      idf: Map[Long, Double],
      numBuckets: Int = 16
  ): DataFrame = {
    val idfMap = typedLit(idf)
    df
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("txt"))
      .withColumn("bks",
        expr(s"""filter(transform(split(txt, ' '), w ->
                   CASE WHEN w = '' THEN NULL
                        ELSE cast(conv(substring(md5(w), 1, 14), 16, 10)
                                  AS long) % $numBuckets END),
                 x -> x IS NOT NULL)"""))
      .select(col("doc_id"),
        explode(expr(
          s"""transform(array_distinct(bks),
                b -> struct(b AS bucket,
                            size(filter(bks, x -> x = b)) AS tf))"""))
          .as("e"))
      .select(
        col("doc_id"),
        col("e.bucket").as("bucket"),
        col("e.tf").cast("long").as("tf"),
        (col("e.tf").cast("long") *
          coalesce(idfMap(col("e.bucket")), lit(0.0))).as("tfidf"))
  }

  /** The trained unigram-LM tokenizer artifact: the fixed candidate piece
    * set with its latest hard-EM counts and smoothed log-probabilities.
    */
  final case class UnigramModel(
      pieces: Array[String],
      counts: Array[Long],
      alpha: Double
  ) {
    val total: Long = counts.sum

    /** ln((c + α) / (C + α·V)) — the one division-then-ln spelling both
      * engines compute on identical integers.
      */
    def logp(i: Int): Double =
      math.log((counts(i) + alpha) / (total + alpha * pieces.length))

    def logpMap: Map[String, Double] =
      pieces.indices.map(i => pieces(i) -> logp(i)).toMap
  }

  /** Viterbi segmentation of one word under a piece→logp map: maximize
    * Σ log p over segmentations with pieces of length ≤ `maxPieceLen`;
    * unknown pieces score the -1e18 floor (so even unseen characters
    * segment deterministically). Tie rule: at equal score take the
    * SMALLEST split point j (= the longest final piece) — iterating j
    * ascending with a strict `>` keeps the first maximum, exactly the
    * first-match `list_position` the SQL replay uses.
    */
  private[graft] def viterbiSegment(
      w: String,
      lp: String => Double,
      maxPieceLen: Int
  ): Array[String] = {
    val n = w.length
    val dp = new Array[Double](n + 1)
    val bp = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Double.NegativeInfinity
      var bj = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val s = dp(j) + lp(w.substring(j, i))
        if (s > best) { best = s; bj = j }
        j += 1
      }
      dp(i) = best
      bp(i) = bj
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      out.prepend(w.substring(bp(pos), pos))
      pos = bp(pos)
    }
    out.toArray
  }

  /** Unigram-LM tokenizer training (Kudo 2018 — the SentencePiece
    * unigram model) by hard (Viterbi) EM over the weighted word
    * vocabulary — the second published tokenizer family next to
    * [[bpeMerges]], and the same 100-TB split: the CORPUS-sized work is
    * ONE distributed word→count hash aggregation (map-side combined on
    * vocabulary keys — the only stage that touches the data), and the EM
    * loop then runs on the driver over the bounded weighted vocab,
    * exactly where sentencepiece runs it.
    *
    * Deterministic spelling (everything replays in SQL):
    *  - candidate pieces = every substring of length ≤ `maxPieceLen`
    *    with weighted occurrence count ≥ `minCount`, plus ALL single
    *    characters (guaranteed segmentability); the piece SET is fixed
    *    across rounds (no pruning — the production extension would drop
    *    the lowest-loss pieces per round);
    *  - p(piece) = (c + α) / (C + α·V) additive smoothing, ln applied to
    *    one exact-integer division;
    *  - E-step = [[viterbiSegment]] hard assignments weighted by word
    *    frequency (ties → longest final piece, the first-max rule);
    *  - M-step = integer piece counts; `rounds` is a FIXED schedule.
    *
    * @return (piece, count, logp): the fixed vocabulary with its
    *         final-round counts and smoothed log-probs (rounded 1e-6)
    */
  def unigramTrain(
      df: DataFrame,
      textCol: String,
      maxPieceLen: Int = 4,
      minCount: Long = 5,
      rounds: Int = 2,
      alpha: Double = 0.5,
      minWordCount: Long = DefaultMinWordCount,
      maxVocabWords: Int = DefaultMaxVocabWords
  ): UnigramModel = {
    require(rounds >= 1, s"unigram: rounds must be >= 1, got $rounds")
    val wordCounts: Array[(String, Long)] =
      weightedWordCounts(df, textCol, minWordCount, maxVocabWords)
    // candidate pieces: weighted substring occurrence counts
    // (bounded by the capped word table: ≤ maxVocabWords · maxLen ·
    // maxPieceLen candidate instances)
    val candCounts = scala.collection.mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      val n = w.length
      var p = 0
      while (p < n) {
        var l = 1
        while (l <= math.min(maxPieceLen, n - p)) {
          val piece = w.substring(p, p + l)
          candCounts(piece) = candCounts.getOrElse(piece, 0L) + c
          l += 1
        }
        p += 1
      }
    }
    val pieces = candCounts
      .filter { case (piece, c) => piece.length == 1 || c >= minCount }
      .keys.toArray.sorted
    val index = pieces.zipWithIndex.toMap
    var model = UnigramModel(
      pieces, pieces.map(candCounts(_)), alpha)
    var r = 0
    while (r < rounds) {
      val lpm = model.logpMap
      val lp: String => Double = s => lpm.getOrElse(s, -1e18)
      val newCounts = new Array[Long](pieces.length)
      wordCounts.foreach { case (w, c) =>
        viterbiSegment(w, lp, maxPieceLen).foreach { piece =>
          // every selected piece is in the fixed vocab (all single chars
          // of the training corpus are), so the lookup cannot miss
          newCounts(index(piece)) += c
        }
      }
      model = UnigramModel(pieces, newCounts, alpha)
      r += 1
    }
    model
  }

  /** Vocabulary PRUNING round on a trained unigram model — the
    * production step the base trainer's scaladoc declares: multi-char
    * pieces whose hard-EM count fell below `pruneMinCount` are dropped
    * (single chars always stay — segmentability), probabilities are
    * re-normalized over the surviving vocabulary, and ONE more Viterbi
    * E+M round re-estimates counts under the pruned model (usage
    * concentrates on the survivors — the count-threshold proxy for
    * Kudo's likelihood-loss criterion, deterministic and
    * SQL-replayable). Same corpus split as training: one distributed
    * word→count aggregation, driver EM over the bounded vocab.
    */
  def unigramPrune(
      df: DataFrame,
      textCol: String,
      model: UnigramModel,
      maxPieceLen: Int = 4,
      pruneMinCount: Long = 30,
      minWordCount: Long = DefaultMinWordCount,
      maxVocabWords: Int = DefaultMaxVocabWords
  ): UnigramModel = {
    val wordCounts: Array[(String, Long)] =
      weightedWordCounts(df, textCol, minWordCount, maxVocabWords)
    val keptIdx = model.pieces.indices.filter(i =>
      model.pieces(i).length == 1 || model.counts(i) >= pruneMinCount)
    val pruned = UnigramModel(
      keptIdx.map(model.pieces).toArray,
      keptIdx.map(model.counts).toArray,
      model.alpha)
    val lpm = pruned.logpMap
    val lp: String => Double = s => lpm.getOrElse(s, -1e18)
    val index = pruned.pieces.zipWithIndex.toMap
    val newCounts = new Array[Long](pruned.pieces.length)
    wordCounts.foreach { case (w, c) =>
      viterbiSegment(w, lp, maxPieceLen).foreach { piece =>
        newCounts(index(piece)) += c
      }
    }
    UnigramModel(pruned.pieces, newCounts, model.alpha)
  }

  /** The [[unigramTrain]] artifact as the declared query table. */
  def unigramVocab(spark: org.apache.spark.sql.SparkSession,
      model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.indices
      .map(i => (model.pieces(i), model.counts(i), model.logp(i)))
      .toDF("piece", "count", "logp")
  }

  /** Persist the tokenizer artifact as a parquet table
    * (piece, count, alpha) — the A3 codebook-save discipline applied to
    * the unigram model: driver-small, schema-stable, reloadable by any
    * engine. [[loadUnigramModel]] validates shape on load (non-empty,
    * unique pieces, every referenced character segmentable) and
    * reconstructs the identical [[UnigramModel]] (counts and alpha are
    * the full state — log-probs are derived).
    */
  def saveUnigramModel(
      spark: org.apache.spark.sql.SparkSession,
      model: UnigramModel,
      path: String
  ): Unit = {
    import spark.implicits._
    model.pieces.indices
      .map(i => (model.pieces(i), model.counts(i), model.alpha))
      .toDF("piece", "count", "alpha")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadUnigramModel(
      spark: org.apache.spark.sql.SparkSession, path: String
  ): UnigramModel = {
    val rows = spark.read.parquet(path)
      .select(col("piece"), col("count").cast("long"), col("alpha"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, s"unigram model at $path is empty")
    require(rows.map(_._1).distinct.length == rows.length,
      s"unigram model at $path has duplicate pieces")
    val alphas = rows.map(_._3).distinct
    require(alphas.length == 1,
      s"unigram model at $path carries ${alphas.length} distinct alphas")
    val chars = rows.map(_._1).filter(_.length == 1).toSet
    rows.map(_._1).filter(_.length > 1).foreach { p =>
      p.foreach(c => require(chars.contains(c.toString),
        s"unigram model at $path cannot segment piece '$p': " +
          s"missing single char '$c'"))
    }
    UnigramModel(rows.map(_._1), rows.map(_._2), alphas.head)
  }

  /** Viterbi-encode the corpus under a trained unigram model — the
    * serving twin of [[unigramTrain]], split like [[bpeEncode]]: the
    * driver-small model ships in the task closure and the DP kernel runs
    * embarrassingly parallel per partition. Per doc: word count, token
    * count, and an md5-folded fingerprint of the token stream
    * (h = (h·31 + int(md5(piece)[0:8])) mod 1e9+7 in word order) that
    * keeps the full segmentation checkable without shipping it — and
    * engine-neutral, unlike a JVM hashCode.
    */
  def unigramEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: UnigramModel,
      maxPieceLen: Int = 4
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lpm = model.logpMap
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val lp: String => Double = s => lpm.getOrElse(s, -1e18)
        // memoized per partition: emitted pieces are model pieces (plus
        // rare unseen single chars), so each md5 is computed once
        val hashCache = new java.util.HashMap[String, java.lang.Long]()
        def pieceHash(piece: String): Long = {
          val cached = hashCache.get(piece)
          if (cached ne null) cached.longValue()
          else {
            md.reset()
            val h = java.lang.Long.parseLong(
              md.digest(piece.getBytes("UTF-8"))
                .take(4).map("%02x".format(_)).mkString, 16)
            hashCache.put(piece, h)
            h
          }
        }
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var nTok = 0L
          var h = 0L
          words.foreach { w =>
            viterbiSegment(w, lp, maxPieceLen).foreach { piece =>
              h = (h * 31 + pieceHash(piece)) % P
              nTok += 1
            }
          }
          (id, words.length.toLong, nTok, h)
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "tokens_hash")
  }

  /** WordPiece merge-rule training (Schuster & Nakajima 2012; the BERT
    * tokenizer — the THIRD published tokenizer family next to
    * [[bpeMerges]] and [[unigramTrain]]). Identical 100-TB split: the
    * corpus-sized pass is ONE distributed word→count hash aggregation
    * (map-side combined on vocabulary keys — the only stage that touches
    * the data), and the merge loop runs on the driver over the bounded
    * weighted vocabulary, exactly where HF tokenizers runs it.
    *
    * The ONLY semantic delta vs BPE is the selection rule: each round
    * merges the adjacent pair maximizing the likelihood gain
    * `score = count(l,r) / (count(l) · count(r))` (symbol counts over
    * the CURRENT segmentation) instead of the raw pair count — rare
    * informative pairs beat frequent-but-independent ones. Continuation
    * symbols carry the `##` prefix (word split = first char bare,
    * remaining chars `##`-prefixed; merged symbol = l + strip##(r), so
    * the prefix rides the word-initial side). Fully deterministic:
    * score is ONE division of exact integer counts (both engines divide
    * identical doubles), ties break (l, r) lexicographically; the
    * greedy left-to-right non-overlap rewrite is [[bpeMerges]]'s.
    *
    * @return (merge_rank, left, right, merged, pair_count, score):
    *         the learned merge table; score is the raw double (one
    *         exact-integer division — engine-portable as-is)
    */
  def wordPieceTrain(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2,
      minWordCount: Long = DefaultMinWordCount,
      maxVocabWords: Int = DefaultMaxVocabWords
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wordCounts: Array[(String, Long)] =
      weightedWordCounts(df, textCol, minWordCount, maxVocabWords)
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else "##" + ch
      }.toArray, c)
    }
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long, Double)]()
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      val symCounts = scala.collection.mutable.HashMap[String, Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts(syms(i)) = symCounts.getOrElse(syms(i), 0L) + c
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          }
          i += 1
        }
      }
      val best = pairCounts.toSeq
        .filter(_._2 >= minPairCount)
        .map { case ((l, r), pc) =>
          (l, r, pc, pc.toDouble / (symCounts(l).toDouble * symCounts(r).toDouble))
        }
        .sortBy { case (l, r, _, score) => (-score, l, r) }
        .headOption
      best match {
        case None => done = true
        case Some((l, r, pc, score)) =>
          val merged = l + r.substring(2) // continuation symbol sheds its ##
          merges += ((rank, l, r, merged, pc, score))
          vocab = vocab.map { case (syms, wc) =>
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += merged; i += 2 // greedy left-to-right, no overlap
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, wc)
          }
          rank += 1
      }
    }
    merges.toSeq
      .toDF("merge_rank", "left", "right", "merged", "pair_count", "score")
  }

  /** Greedy longest-match-first WordPiece encoding (the BERT serving
    * rule): per word, repeatedly take the LONGEST vocab piece matching
    * at the cursor (`##`-prefixed after the first), whole word → `[UNK]`
    * the moment no piece matches. The vocabulary is the training
    * alphabet (word-initial chars bare + continuation chars `##`-
    * prefixed) plus the merged pieces — driver-small, ships in the task
    * closure; the matcher runs embarrassingly parallel per partition.
    * Per doc: word/token/UNK counts + the engine-neutral md5-folded
    * token-stream fingerprint ([[unigramEncode]]'s spelling, `[UNK]`
    * hashing as its literal piece string).
    */
  def wordPieceEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Set[String]
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(vocab.nonEmpty, "wordPieceEncode: empty vocabulary")
    val maxConsume = vocab.iterator
      .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // memoized per partition: pieces come from the bounded vocab, so
        // each md5 is computed once, not once per token instance
        val hashCache = new java.util.HashMap[String, java.lang.Long]()
        def pieceHash(piece: String): Long = {
          val cached = hashCache.get(piece)
          if (cached ne null) cached.longValue()
          else {
            md.reset()
            val h = java.lang.Long.parseLong(
              md.digest(piece.getBytes("UTF-8"))
                .take(4).map("%02x".format(_)).mkString, 16)
            hashCache.put(piece, h)
            h
          }
        }
        val unkHash = pieceHash("[UNK]")
        it.map { case (id, text) =>
          val words = text.split(" ").filter(_.nonEmpty)
          var nTok = 0L
          var nUnk = 0L
          var h = 0L
          words.foreach { w =>
            val n = w.length
            var pos = 0
            val picked = scala.collection.mutable.ArrayBuffer.empty[String]
            var failed = false
            while (pos < n && !failed) {
              var len = math.min(maxConsume, n - pos)
              var hit: String = null
              while (len >= 1 && hit == null) {
                val cand =
                  (if (pos == 0) "" else "##") + w.substring(pos, pos + len)
                if (vocab.contains(cand)) hit = cand
                len -= 1
              }
              if (hit == null) failed = true
              else { picked += hit; pos += (if (pos == 0) hit.length else hit.length - 2) }
            }
            val out = if (failed) Seq("[UNK]") else picked.toSeq
            if (failed) nUnk += 1
            out.foreach { piece =>
              h = (h * 31 + (if (piece == "[UNK]") unkHash else pieceHash(piece))) % P
              nTok += 1
            }
          }
          (id, words.length.toLong, nTok, nUnk, h)
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "n_unk", "tokens_hash")
  }

  /** Persist a WordPiece serving model — the A3 codebook-persistence
    * discipline ([[saveUnigramModel]]'s analog for the third tokenizer
    * family): one parquet of (piece, is_continuation), trivially
    * re-shardable; [[loadWordPieceModel]] validates and reconstructs the
    * identical vocabulary set.
    */
  def saveWordPieceModel(
      spark: org.apache.spark.sql.SparkSession,
      vocab: Set[String],
      path: String
  ): Unit = {
    import spark.implicits._
    require(vocab.nonEmpty, "saveWordPieceModel: empty vocabulary")
    vocab.toSeq.sorted
      .map(p => (p, p.startsWith("##")))
      .toDF("piece", "is_continuation")
      .write.parquet(path)
  }

  /** Load a persisted WordPiece vocabulary, shape-validated: pieces
    * unique, the `is_continuation` flag consistent with the `##` prefix
    * (a corrupted artifact fails loudly, not at serving time), and every
    * multi-char piece's first character present as a word-initial piece
    * (else the greedy matcher could never reach it).
    */
  def loadWordPieceModel(
      spark: org.apache.spark.sql.SparkSession, path: String
  ): Set[String] = {
    val rows = spark.read.parquet(path)
      .select(col("piece"), col("is_continuation").cast("boolean"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    require(rows.nonEmpty, s"wordpiece model at $path is empty")
    require(rows.map(_._1).distinct.length == rows.length,
      s"wordpiece model at $path has duplicate pieces")
    rows.foreach { case (p, cont) =>
      require(p.startsWith("##") == cont,
        s"wordpiece model at $path: piece '$p' flag mismatch")
      require(if (cont) p.length > 2 else p.nonEmpty,
        s"wordpiece model at $path: degenerate piece '$p'")
    }
    val vocab = rows.map(_._1).toSet
    vocab.filter(p => !p.startsWith("##") && p.length > 1).foreach { p =>
      require(vocab.contains(p.substring(0, 1)),
        s"wordpiece model at $path: '$p' lacks word-initial char " +
          s"'${p.substring(0, 1)}' — greedy fallback would [UNK] its words")
    }
    vocab
  }

  /** The WordPiece serving vocabulary derived from a training corpus +
    * merge table: training alphabet ∪ merged pieces ([[wordPieceEncode]]'s
    * contract). The alphabet is a distributed distinct over (position,
    * char) pairs — corpus-sized input, alphabet-sized output.
    */
  def wordPieceVocab(df: DataFrame, textCol: String, merges: DataFrame): Set[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val alpha = df
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .select(posexplode(split(col("w"), "")).as(Seq("i", "ch")))
      .select(
        when(col("i") === 0, col("ch"))
          .otherwise(concat(lit("##"), col("ch"))).as("p"))
      .distinct()
      .as[String]
      .collect()
    val merged = merges.select(col("merged")).as[String].collect()
    (alpha ++ merged).toSet
  }
}
