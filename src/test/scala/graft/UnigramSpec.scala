package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Invariants for the unigram-LM tokenizer (Kudo 2018, hard-EM): exact
  * agreement with an independent reference trainer, segmentability,
  * vocabulary rules, and encode determinism.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val L = 4
  private val MinC = 5L
  private val Alpha = 0.5

  /** Independent reference: same declared algorithm, written straight
    * from the spelling in the scaladoc (candidates → smoothed probs →
    * Viterbi with ascending-j strict-max ties → weighted counts).
    */
  private def refTrain(
      words: Map[String, Long], rounds: Int): Map[String, (Long, Double)] = {
    val cand = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      for (p <- 0 until w.length; l <- 1 to math.min(L, w.length - p))
        cand(w.substring(p, p + l)) = cand.getOrElse(w.substring(p, p + l), 0L) + c
    }
    val vocab = cand.filter { case (s, c) => s.length == 1 || c >= MinC }
      .keys.toVector.sorted
    var counts = vocab.map(cand(_)).toArray
    def seg(w: String, lp: Map[String, Double]): Seq[String] = {
      val n = w.length
      val dp = Array.fill(n + 1)(0.0)
      val bp = new Array[Int](n + 1)
      for (i <- 1 to n) {
        var best = Double.NegativeInfinity; var bj = -1
        for (j <- math.max(0, i - L) until i) {
          val s = dp(j) + lp.getOrElse(w.substring(j, i), -1e18)
          if (s > best) { best = s; bj = j }
        }
        dp(i) = best; bp(i) = bj
      }
      var pos = n
      var out = List.empty[String]
      while (pos > 0) { out = w.substring(bp(pos), pos) :: out; pos = bp(pos) }
      out
    }
    (1 to rounds).foreach { _ =>
      val total = counts.sum
      val lp = vocab.indices.map(i => vocab(i) ->
        math.log((counts(i) + Alpha) / (total + Alpha * vocab.length))).toMap
      val nc = new Array[Long](vocab.length)
      val idx = vocab.zipWithIndex.toMap
      words.foreach { case (w, c) =>
        seg(w, lp).foreach(p => nc(idx(p)) += c)
      }
      counts = nc
    }
    val total = counts.sum
    vocab.indices.map { i =>
      vocab(i) -> ((counts(i),
        math.log((counts(i) + Alpha) / (total + Alpha * vocab.length))))
    }.toMap
  }

  private def corpus = Seq(
    "the cat sat on the mat",
    "the catalog lists the cats",
    "concatenate the category",
    "a mat a cat a hat",
    "the the the cat cat mat"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("training matches the independent reference exactly") {
    val docs = corpus.toDF("doc_id", "text")
    val model = TextAnalysis.unigramTrain(docs, "text",
      maxPieceLen = L, minCount = MinC, rounds = 2, alpha = Alpha)
    val words = corpus.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = refTrain(words, rounds = 2)
    val got = model.pieces.indices
      .map(i => model.pieces(i) -> ((model.counts(i), model.logp(i)))).toMap
    assert(got.keySet == want.keySet,
      s"vocab mismatch: ${got.keySet -- want.keySet} / ${want.keySet -- got.keySet}")
    got.foreach { case (p, (c, lp)) =>
      assert(want(p)._1 == c, s"count mismatch on '$p': $c vs ${want(p)._1}")
      assert(want(p)._2 == lp, s"logp mismatch on '$p'")
    }
  }

  test("vocabulary rules: all single chars kept, multi-char pieces pass minCount") {
    val docs = corpus.toDF("doc_id", "text")
    val model = TextAnalysis.unigramTrain(docs, "text",
      maxPieceLen = L, minCount = MinC, rounds = 2, alpha = Alpha)
    val chars = corpus.flatMap(_._2.split(" ")).flatMap(_.toSeq).toSet
    chars.foreach(c =>
      assert(model.pieces.contains(c.toString), s"missing single char '$c'"))
    assert(model.pieces.exists(_.length > 1), "no multi-char pieces learned")
    assert(model.pieces.length == model.pieces.distinct.length)
    // frequent substrings survive: 'the' and 'cat' appear often enough
    assert(model.pieces.contains("the"))
    assert(model.pieces.contains("cat"))
  }

  test("viterbi: segmentation reconstructs the word; dominant piece wins") {
    // hand-built model: 'ab' has high prob, chars low
    val lp = Map("ab" -> -0.5, "a" -> -3.0, "b" -> -3.0, "c" -> -3.0)
    val f: String => Double = s => lp.getOrElse(s, -1e18)
    assert(TextAnalysis.viterbiSegment("ababc", f, 4).toSeq ==
      Seq("ab", "ab", "c"))
    assert(TextAnalysis.viterbiSegment("abc", f, 4).toSeq == Seq("ab", "c"))
    // reconstruction for arbitrary strings (unknown chars fall back to
    // single-char floor pieces)
    Seq("zzz", "abcab", "xyab").foreach { w =>
      assert(TextAnalysis.viterbiSegment(w, f, 4).mkString == w)
    }
  }

  test("prune: singles survive, weak multi-char pieces leave, mass re-concentrates") {
    val docs = corpus.toDF("doc_id", "text")
    val base = TextAnalysis.unigramTrain(docs, "text",
      maxPieceLen = L, minCount = MinC, rounds = 2, alpha = Alpha)
    val pruneAt = 3L
    val pruned = TextAnalysis.unigramPrune(docs, "text", base,
      maxPieceLen = L, pruneMinCount = pruneAt)
    // vocabulary rule: subset of the base vocab; every single char kept;
    // every dropped piece was multi-char below the threshold
    val baseMap = base.pieces.zip(base.counts).toMap
    assert(pruned.pieces.toSet.subsetOf(base.pieces.toSet))
    base.pieces.filter(_.length == 1)
      .foreach(c => assert(pruned.pieces.contains(c), s"single '$c' dropped"))
    (base.pieces.toSet -- pruned.pieces.toSet).foreach { p =>
      assert(p.length > 1 && baseMap(p) < pruneAt, s"wrongly pruned '$p'")
    }
    // re-estimation invariants: every word still segments fully, so the
    // CHARACTER mass Σ count·|piece| is conserved exactly, while the
    // token count can only grow (fewer multi-char pieces available)
    def charMass(m: TextAnalysis.UnigramModel) =
      m.pieces.indices.map(i => m.counts(i) * m.pieces(i).length).sum
    assert(charMass(pruned) == charMass(base),
      s"${charMass(pruned)} vs ${charMass(base)}")
    assert(pruned.counts.sum >= base.counts.sum)
    assert(pruned.pieces.length < base.pieces.length, "nothing was pruned")
  }

  test("model save/load: identical round trip, validated artifact") {
    val docs = corpus.toDF("doc_id", "text")
    val model = TextAnalysis.unigramTrain(docs, "text",
      maxPieceLen = L, minCount = MinC, rounds = 2, alpha = Alpha)
    val dir = java.nio.file.Files.createTempDirectory("unimodel").toString
    TextAnalysis.saveUnigramModel(spark, model, s"$dir/m")
    val back = TextAnalysis.loadUnigramModel(spark, s"$dir/m")
    assert(back.pieces.toSeq == model.pieces.toSeq)
    assert(back.counts.toSeq == model.counts.toSeq)
    assert(back.alpha == model.alpha)
    // encode under the reloaded model is bit-identical
    val a = TextAnalysis.unigramEncode(docs, "doc_id", "text", model, L)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.unigramEncode(docs, "doc_id", "text", back, L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // a broken artifact (multi-char piece with no single-char support)
    // is rejected on load
    import spark.implicits._
    Seq(("xy", 5L, Alpha)).toDF("piece", "count", "alpha")
      .write.mode("overwrite").parquet(s"$dir/bad")
    intercept[IllegalArgumentException](
      TextAnalysis.loadUnigramModel(spark, s"$dir/bad"))
  }

  test("encode: counts and fingerprint are deterministic and partition-invariant") {
    val docs = corpus.toDF("doc_id", "text")
    val model = TextAnalysis.unigramTrain(docs, "text",
      maxPieceLen = L, minCount = MinC, rounds = 2, alpha = Alpha)
    val a = TextAnalysis.unigramEncode(docs, "doc_id", "text", model, L)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.unigramEncode(docs.repartition(7), "doc_id", "text", model, L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    a.foreach { r =>
      val nWords = r.getLong(1); val nTok = r.getLong(2)
      assert(nTok >= nWords, s"fewer tokens than words: $r")
      assert(r.getLong(3) >= 0L)
    }
    // compression: multi-char pieces mean fewer tokens than characters
    val chars = corpus.map(_._2.replace(" ", "").length).sum
    assert(a.map(_.getLong(2)).sum < chars, "no compression over characters")
  }
}
