package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text/embedding corpora
  * (SURVEY.md §2 C7 + the LLM-pipeline extension surface): exact,
  * token-shingle Jaccard (inverted-index self-join), MinHash+LSH,
  * SimHash, and embedding-cosine near-dup.
  *
  * Scale notes (100 TB): every candidate-pair generator here is *blocked* —
  * pairs materialize only inside a bucket (shared shingle / LSH band
  * signature / SimHash band), never as a full cross join. The verify step
  * (exact Jaccard / hamming) touches candidate pairs only. All hashes are
  * md5-derived and engine-portable, so results are reproducible across
  * engines and runs (no JVM hashCode anywhere).
  */
object Dedup {

  /** 56-bit integer from the md5 hex prefix — the shared deterministic
    * string hash (same value DuckDB computes from its md5).
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  private val P = 1000000007L

  /** Exact dedup by full-content hash: every doc mapped to the smallest
    * doc_id holding identical text (hash-groupBy, one shuffle on the
    * md5 key).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("h"))
      .groupBy(col("h"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("group_n")
      )

  /** (doc_id, shingle) pairs: distinct word n-grams per document. */
  def shingles(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3
  ): DataFrame =
    df.select(
        col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks")
      )
      .select(
        col("doc_id"),
        explode(
          when(
            size(col("toks")) >= n,
            expr(
              s"transform(sequence(0, size(toks)-$n), i -> " +
                (0 until n).map(j => s"toks[i+$j]").mkString("concat_ws(' ', ", ", ", ")") + ")"
            )
          ).otherwise(array())
        ).as("sh")
      )
      .distinct()

  /** n-gram Jaccard near-dup pairs via inverted-index self-join: explode
    * shingles, equi-join on the shingle (blocked — only co-occurring pairs
    * appear), count the intersection, Jaccard from set sizes, threshold.
    * Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * @param maxShingleDocFreq skew guard for the candidate generator: a
    *   shingle shared by f documents contributes O(f²) candidate pairs, so
    *   one boilerplate phrase in 1% of a 10⁹-doc corpus would explode the
    *   join. Capping drops shingles with doc-frequency above the cap from
    *   the inverted index ONLY — verification still counts intersections
    *   over the full shingle sets, so surviving pairs carry their exact
    *   Jaccard (the cap can only lose candidates, never corrupt scores).
    *   Default unlimited = exact.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      tau: Double = 0.5,
      maxShingleDocFreq: Int = Int.MaxValue
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    if (maxShingleDocFreq == Int.MaxValue) {
      // uncapped: the inverted-index self-join IS the intersection count —
      // aggregate it directly, one pass over the shingle table
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val common = sh.as("a")
        .join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
      common
        .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
        .withColumn(
          "jaccard",
          col("c").cast("double") / (col("na") + col("nb") - col("c"))
        )
        .filter(col("jaccard") >= tau)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    } else {
      // capped: generate candidates from the pruned index, verify against
      // the full shingle sets so surviving scores stay exact
      val rare = sh.groupBy(col("sh"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDocFreq)
        .select(col("sh"))
      val idx = sh.join(rare, "sh")
      val cand = idx.as("a")
        .join(idx.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      verifyJaccard(cand, sh, tau)
    }
  }

  /** Exact-Jaccard verification of candidate pairs against the full
    * (doc_id, sh) table.
    */
  private def verifyJaccard(
      cand: DataFrame,
      sh: DataFrame,
      tau: Double
  ): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val common = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .filter(col("sh") === col("shb"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .withColumn(
        "jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c"))
      )
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signatures: for permutation i (0-based), the min over the
    * doc's shingle hashes of `((2i+1)·x + 12289·i) mod P`. Returns
    * (doc_id, i, v).
    */
  def minhash(
      sh: DataFrame,
      numPerms: Int
  ): DataFrame = {
    val wide = minhashWide(sh, numPerms)
    val stackArgs =
      (0 until numPerms).map(i => s"$i, v$i").mkString(", ")
    wide.select(
      col("doc_id"),
      expr(s"stack($numPerms, $stackArgs)").as(Seq("i", "v"))
    )
  }

  /** One row per doc with all `numPerms` min-hashes as columns — a single
    * groupBy with N min-aggregates instead of an N-way row explosion (the
    * shingle table is read once; shuffle stays at one row per doc).
    */
  def minhashWide(sh: DataFrame, numPerms: Int): DataFrame = {
    val hashed = sh.withColumn("x", pmod(md5Long(col("sh")), lit(P)))
    val mins = (0 until numPerms).map { i =>
      min(pmod(lit(2L * i + 1) * col("x") + lit(12289L * i), lit(P))).as(s"v$i")
    }
    hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH near-dup detection: band the signature (rows-per-band
    * consecutive permutations, signature string per band), bucket-join on
    * (band, signature) to get candidates, then verify candidates with the
    * exact shingle Jaccard. Returns (doc_a, doc_b, jaccard), doc_a < doc_b,
    * jaccard >= tau.
    */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numPerms: Int = 16,
      bands: Int = 4,
      tau: Double = 0.5
  ): DataFrame = {
    require(numPerms % bands == 0)
    val rowsPerBand = numPerms / bands
    val sh = shingles(df, idCol, textCol, n).cache()
    val wide = minhashWide(sh, numPerms)
    val bandCols = (0 until bands).map { bd =>
      concat_ws(
        ",",
        (bd * rowsPerBand until (bd + 1) * rowsPerBand)
          .map(i => col(s"v$i").cast("string")): _*
      ).as(s"sig$bd")
    }
    val stackArgs = (0 until bands).map(bd => s"$bd, sig$bd").mkString(", ")
    val sigs = wide
      .select(col("doc_id") +: bandCols: _*)
      .select(
        col("doc_id"),
        expr(s"stack($bands, $stackArgs)").as(Seq("band", "sig"))
      )
    val cand = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cand, sh, tau)
  }

  /** 32-bit SimHash over token hashes: bit b of the signature is set when
    * the sum over tokens of ±1 (sign of bit b of the token hash) is >= 0.
    * Returns (doc_id, simhash).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // 32 signed bit-sums as parallel aggregates over one token scan — no
    // 32-way row explosion; shuffle is one row per doc
    val hashed = df
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .withColumn("x", conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { b =>
      sum(when(expr(s"(x >> $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b")
    }
    hashed
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(
        col("doc_id"),
        (0 until 32)
          .map(b => when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _)
          .as("simhash")
      )
  }

  /** SimHash near-dup pairs: candidates share a 16-bit half (two-band
    * exact-match blocking), verified by hamming distance <= maxHamming.
    * Returns (doc_a, doc_b, hamming).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val sig = simhash(df, idCol, textCol)
      .withColumn("hi", shiftright(col("simhash"), 16))
      .withColumn("lo", col("simhash").bitwiseAND(65535))
      .cache()
    def half(c: String) = sig.as("a")
      .join(sig.as("b"),
        col(s"a.$c") === col(s"b.$c") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb")
      )
    half("hi").union(half("lo")).distinct()
      .withColumn(
        "hamming",
        bit_count(col("sa").bitwiseXOR(col("sb")))
      )
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Embedding-cosine near-dup pairs above `tau`. Exact similarity
    * self-join — at corpus scale the candidate generator should be an LSH
    * or PQ-code block key first (see [[minhashLsh]] / [[ProductQuantizer]]);
    * the verify math is this same expression either way.
    */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double
  ): DataFrame = {
    import graft.functions.VectorExpressions._
    // per-row norm precompute + codegen dot: one fused multiply-add loop
    // per pair instead of three boxed array folds
    val e = df
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
    e.as("a")
      .join(e.as("b"), col("a.id") < col("b.id"))
      .select(
        col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        (dotFast(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine")
      )
      .filter(col("cosine") >= tau)
  }
}
