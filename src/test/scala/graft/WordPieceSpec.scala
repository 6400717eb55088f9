package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.queries.Q

/** Invariants for the WordPiece tokenizer (Schuster & Nakajima 2012):
  * exact agreement with an independent reference trainer, the
  * likelihood-gain selection rule (vs BPE's raw-count rule), greedy
  * longest-match-first encoding, `[UNK]` semantics, and `##`
  * continuation-prefix bookkeeping.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference trainer, written straight from the scaladoc
    * spelling (symbol split with ## continuations → pair + symbol counts
    * → score = pc/(cl·cr) → lexicographic ties → greedy non-overlap
    * rewrite). Structured differently from the operator (immutable fold,
    * no shared code).
    */
  private def refTrain(
      words: Map[String, Long],
      numMerges: Int,
      minPair: Long): List[(Int, String, String, String, Long, Double)] = {
    def split(w: String): Vector[String] =
      w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else s"##$c"
      }.toVector
    def rewrite(syms: Vector[String], l: String, r: String,
        m: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += m; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var vocab = words.toVector.map { case (w, c) => (split(w), c) }
    var acc = List.empty[(Int, String, String, String, Long, Double)]
    var rank = 0
    var stop = false
    while (rank < numMerges && !stop) {
      val sym = vocab.flatMap { case (s, c) => s.map(_ -> c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val pairs = vocab.flatMap { case (s, c) =>
        s.zip(s.drop(1)).map(p => p -> c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val cands = pairs.toList.filter(_._2 >= minPair).map {
        case ((l, r), pc) => (l, r, pc, pc.toDouble / (sym(l).toDouble * sym(r).toDouble))
      }
      if (cands.isEmpty) stop = true
      else {
        val (l, r, pc, sc) = cands.minBy { case (l, r, _, s) => (-s, l, r) }(
          Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.String, Ordering.String))
        val m = l + r.drop(2)
        acc = acc :+ ((rank, l, r, m, pc, sc))
        vocab = vocab.map { case (s, c) => (rewrite(s, l, r, m), c) }
        rank += 1
      }
    }
    acc
  }

  private def corpus = Seq(
    (1L, "low low lower lowest"),
    (2L, "new newer newest low"),
    (3L, "wide wider new low")).toDF("doc_id", "text")

  test("train agrees exactly with the independent reference") {
    val got = TextAnalysis.wordPieceTrain(corpus, "text", numMerges = 8)
      .orderBy(col("merge_rank"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getDouble(5)))
      .toList
    val words = corpus.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    val want = refTrain(words, 8, 2)
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got.nonEmpty)
  }

  test("selection rule is likelihood gain, not raw pair count") {
    // 'ab' appears 9× but a,b are everywhere (score 9/(18·18));
    // 'xy' appears 2× from rare symbols (score 2/(2·2) = 0.5) — BPE
    // would merge ab first, WordPiece must pick xy.
    val df = Seq((1L, ("ab " * 9).trim + " aa bb xy xy"))
      .toDF("doc_id", "text")
    val first = TextAnalysis.wordPieceTrain(df, "text", numMerges = 1)
      .collect().head
    assert(first.getString(1) == "x" && first.getString(2) == "##y",
      s"expected (x,##y) first, got (${first.getString(1)},${first.getString(2)})")
    val bpeFirst = TextAnalysis.bpeMerges(df, "text", numMerges = 1)
      .collect().head
    assert(bpeFirst.getString(1) == "a" && bpeFirst.getString(2) == "b",
      "BPE control: raw count should pick (a,b)")
  }

  test("merged symbols keep the word-initial side's prefix") {
    val m = TextAnalysis.wordPieceTrain(corpus, "text", numMerges = 8)
      .collect()
    m.foreach { r =>
      val (l, rr, merged) = (r.getString(1), r.getString(2), r.getString(3))
      assert(rr.startsWith("##"), s"right side '$rr' must be a continuation")
      assert(merged == l + rr.substring(2))
      assert(merged.startsWith("##") == l.startsWith("##"))
    }
  }

  test("encode: greedy longest match, ## continuations, char conservation") {
    val merges = TextAnalysis.wordPieceTrain(corpus, "text", numMerges = 8)
    val vocab = TextAnalysis.wordPieceVocab(corpus, "text", merges)
    // hand-check one segmentation end to end: vocab contains the merged
    // pieces, so 'lowest' must NOT fall back to chars
    val got = TextAnalysis.wordPieceEncode(
      Seq((9L, "lowest")).toDF("doc_id", "text"), "doc_id", "text", vocab)
      .collect().head
    assert(got.getLong(1) == 1L && got.getLong(3) == 0L)
    assert(got.getLong(2) < "lowest".length,
      "greedy match should use multi-char pieces, not per-char fallback")
    // conservation: for every corpus word, consumed chars == word length
    val all = TextAnalysis.wordPieceEncode(corpus, "doc_id", "text", vocab)
      .collect()
    assert(all.forall(_.getLong(4) != 0L))
    assert(all.forall(_.getLong(3) == 0L),
      "training corpus must segment without [UNK] (alphabet is in vocab)")
  }

  test("encode: [UNK] on unseen characters, whole word at once") {
    val merges = TextAnalysis.wordPieceTrain(corpus, "text", numMerges = 8)
    val vocab = TextAnalysis.wordPieceVocab(corpus, "text", merges)
    val got = TextAnalysis.wordPieceEncode(
      Seq((1L, "low qat lowqat"), (2L, "zzz")).toDF("doc_id", "text"),
      "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // 'qat' (unseen q) and 'lowqat' (fails mid-word) each collapse to ONE
    // [UNK] token; 'low' segments normally
    assert(got(1L)._1 == 3L && got(1L)._3 == 2L,
      s"expected 2 UNK words in doc 1, got ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 1L)))
  }

  test("model save/load: identical round trip, validated artifact") {
    val merges = TextAnalysis.wordPieceTrain(corpus, "text", numMerges = 8)
    val vocab = TextAnalysis.wordPieceVocab(corpus, "text", merges)
    val dir = java.nio.file.Files.createTempDirectory("wpmodel").toString
    TextAnalysis.saveWordPieceModel(spark, vocab, s"$dir/m")
    val back = TextAnalysis.loadWordPieceModel(spark, s"$dir/m")
    assert(back == vocab)
    // serving under the reloaded model is bit-identical
    val a = TextAnalysis.wordPieceEncode(corpus, "doc_id", "text", vocab)
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.wordPieceEncode(corpus, "doc_id", "text", back)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // a corrupted artifact (continuation piece whose word-initial char
    // is missing) fails at LOAD, not at serving time
    Seq(("xy", false), ("##z", true)).toDF("piece", "is_continuation")
      .write.parquet(s"$dir/bad")
    intercept[IllegalArgumentException] {
      TextAnalysis.loadWordPieceModel(spark, s"$dir/bad")
    }
  }

  test("encode determinism: partitioning does not change fingerprints") {
    val docs = Q.t(spark, sf0001, "documents").select(col("doc_id"), col("text"))
    val merges = TextAnalysis.wordPieceTrain(docs, "text", numMerges = 12)
    val vocab = TextAnalysis.wordPieceVocab(docs, "text", merges)
    val a = TextAnalysis.wordPieceEncode(docs, "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    val b = TextAnalysis.wordPieceEncode(
      docs.repartition(17), "doc_id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}
