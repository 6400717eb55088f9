package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TextSearch}

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark runs fast queries on big data tables"),
    (2L, "vector search finds neighbors in vector space with vector math"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "big data joins shuffle rows across the cluster"),
    (5L, "one vector mention in an eight token doc")
  ).toDF("doc_id", "text")

  test("bm25: the term-stuffed doc ranks first; docs without the term are absent") {
    val r = TextSearch.bm25(corpus, "doc_id", "text", Seq("vector"), k = 10)
      .collect()
    assert(r.head.getLong(0) == 2L, r.mkString(",")) // 3 occurrences of 'vector'
    val ids = r.map(_.getLong(0)).toSet
    assert(ids == Set(2L, 5L), "only docs containing the term score")
    // rnk is contiguous from 1 and ordered by score desc
    assert(r.map(_.getLong(2)).toSeq == (1L to ids.size).toSeq)
    val scores = r.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("bm25: multi-term scores are the sum of single-term scores") {
    val both = TextSearch.bm25(corpus, "doc_id", "text",
      Seq("vector", "data"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val a = TextSearch.bm25(corpus, "doc_id", "text", Seq("vector"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val b = TextSearch.bm25(corpus, "doc_id", "text", Seq("data"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    both.foreach { case (id, s) =>
      val expect = a.getOrElse(id, 0.0) + b.getOrElse(id, 0.0)
      assert(math.abs(s - expect) < 1e-5, s"doc $id: $s vs $expect")
    }
  }

  test("qld: every document scores; term-rich docs rank first") {
    val r = TextSearch
      .queryLikelihood(corpus, "doc_id", "text", Seq("vector"), mu = 100.0, k = 10)
      .collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getLong(2)))
    // Dirichlet smoothing scores EVERY doc (absent terms get background mass)
    assert(r.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(r.head._1 == 2L, r.mkString(",")) // 3 occurrences of 'vector'
    assert(r(1)._1 == 5L) // 1 occurrence beats 0 occurrences
    val scores = r.map(_._2).toSeq
    assert(scores == scores.sorted.reverse)
    assert(r.map(_._3).toSeq == (1L to 5L).toSeq)
  }

  test("qld: matches the closed-form Dirichlet score on a hand corpus") {
    val mini = Seq((1L, "a b a"), (2L, "b b c")).toDF("doc_id", "text")
    val got = TextSearch
      .queryLikelihood(mini, "doc_id", "text", Seq("a"), mu = 2.0, k = 10)
      .collect()
      .map(row => row.getLong(0) -> row.getDouble(1))
      .toMap
    // cf(a)=2, |C|=6, p=1/3; doc1: ln((2 + 2·(1/3))/(3+2)); doc2: ln((0 + 2/3)/5)
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == rnd6(math.log((2.0 + 2.0 * (2.0 / 6.0)) / 5.0)))
    assert(got(2L) == rnd6(math.log((0.0 + 2.0 * (2.0 / 6.0)) / 5.0)))
  }

  test("rrfFuse: three-list fusion matches the closed form; absent ranks are null") {
    import graft.operators.TextSearch
    def list(rows: (Long, Long)*) = rows.toSeq.toDF("doc_id", "rnk")
    val fused = TextSearch.rrfFuse(Seq(
      "a" -> list(1L -> 1L, 2L -> 2L),
      "b" -> list(1L -> 1L, 3L -> 2L),
      "c" -> list(2L -> 1L, 3L -> 2L)), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), r.getLong(5)))
      .sortBy(_._6)
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(fused(0)._2 == rnd6(1.0 / 61 + 1.0 / 61)) // in a#1 and b#1
    assert(fused(1)._2 == rnd6(1.0 / 62 + 1.0 / 61)) // a#2, c#1
    assert(fused(2)._2 == rnd6(1.0 / 62 + 1.0 / 62)) // b#2, c#2
    assert(fused(0)._5.isEmpty, "doc 1 is absent from list c")
    assert(fused(2)._3.isEmpty, "doc 3 is absent from list a")
  }

  test("perplexity: a doc of repeated common bigrams scores lower NLL than a rare-transition doc") {
    val docs = Seq(
      (1L, "x y x y x y x y x y x y"),
      (2L, "x y x y x y x y x y x y"),
      (3L, "x y x y x y x y x y x y"),
      (4L, "q w e r t z u i o p a s")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.perplexity(docs, "doc_id", "text")
      .select("doc_id", "nll_per_tok", "perplexity")
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L)._1 < r(4L)._1, s"${r(1L)} vs ${r(4L)}")
    // perplexity = exp(nll) up to the 6-decimal rounding
    r.values.foreach { case (nll, ppl) =>
      assert(math.abs(ppl - math.exp(nll)) < 1e-4)
    }
    // identical docs score identically
    assert(r(1L) == r(2L) && r(2L) == r(3L))
  }

  test("perplexity: doc shorter than 2 tokens scores NULL") {
    val docs = Seq((1L, "solo"), (2L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.perplexity(docs, "doc_id", "text").collect()
    val solo = r.find(_.getLong(0) == 1L).get
    assert(solo.isNullAt(1) && solo.isNullAt(2))
    assert(!r.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  private val emb = Seq(
    (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(0.0, 1.0)),
    (4L, Array(0.5, 0.5)), (5L, Array(0.8, 0.0))
  ).toDF("vec_id", "vec")

  test("hybridRrf: results come from the union of the two sides; ranks consistent") {
    val r = TextSearch.hybridRrf(
      corpus, "doc_id", "text", Seq("vector"),
      emb, "vec_id", "vec", Array(1.0, 0.0), kEach = 3, k = 5)
      .orderBy(col("rnk")).collect()
    // every fused row carries at least one side's rank, fused ordering
    // is descending, and both top-1s are present
    assert(r.nonEmpty)
    assert(r.forall(row => !row.isNullAt(2) || !row.isNullAt(3)))
    val fused = r.map(_.getDouble(1)).toSeq
    assert(fused == fused.sorted.reverse)
    val ids = r.map(_.getLong(0)).toSet
    assert(ids.contains(2L), "lexical top-1 must surface") // 3x 'vector'
    assert(ids.contains(1L), "vector top-1 must surface")  // qv == vec 1
  }

  test("hybridRrf: terms matching nothing degrade to the pure vector ranking") {
    val r = TextSearch.hybridRrf(
      corpus, "doc_id", "text", Seq("zzz_not_a_token"),
      emb, "vec_id", "vec", Array(1.0, 0.0), kEach = 3, k = 3)
      .orderBy(col("rnk")).collect()
    assert(r.forall(_.isNullAt(2)), "no lexical ranks may appear")
    // ordering = ascending vector rank; fused = 1/(60 + vec_rnk)
    assert(r.map(row => row.getLong(4) == row.getLong(3)).forall(identity))
  }

  test("rm3: expansion retrieves a doc sharing NO original term; originals still dominate") {
    // "alpha" docs all carry heavy "beta"; d4 has beta but never alpha
    val docs = Seq(
      (1L, "alpha beta beta beta x"),
      (2L, "alpha beta beta y y"),
      (3L, "alpha beta z z z"),
      (4L, "beta beta beta w w"),
      (5L, "gamma delta gamma delta")
    ).toDF("doc_id", "text")
    val r1 = TextSearch.bm25(docs, "doc_id", "text", Seq("alpha"), k = 5)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(r1 == Set(1L, 2L, 3L), "round 1 must not see the alpha-free doc")
    val r3 = TextSearch.rm3(docs, "doc_id", "text", Seq("alpha"),
      kFb = 3, mExp = 2, alpha = 0.6, k = 5)
      .select(col("doc_id"), col("score"), col("rnk"))
      .as[(Long, Double, Long)].collect()
    val ids = r3.map(_._1).toSet
    assert(ids.contains(4L), s"expansion must surface doc 4: $ids")
    assert(!ids.contains(5L), "unrelated doc must stay out")
    // alpha keeps weight 0.6: an original-term doc still ranks first
    assert(Set(1L, 2L, 3L).contains(r3.minBy(_._3)._1), r3.mkString(","))
    // deterministic
    val again = TextSearch.rm3(docs, "doc_id", "text", Seq("alpha"),
      kFb = 3, mExp = 2, alpha = 0.6, k = 5)
      .select(col("doc_id"), col("score"), col("rnk"))
      .as[(Long, Double, Long)].collect()
    assert(again.sortBy(_._3).toSeq == r3.sortBy(_._3).toSeq)
  }

  test("rm3Curve: shared expansion, per-alpha rows; expansion mass falls with alpha") {
    val docs = Seq(
      (1L, "alpha beta beta beta x"),
      (2L, "alpha beta beta y y"),
      (3L, "alpha beta z z z"),
      (4L, "beta beta beta w w"),
      (5L, "gamma delta gamma delta")
    ).toDF("doc_id", "text")
    val curve = TextSearch.rm3Curve(docs, "doc_id", "text", Seq("alpha"),
      alphas = Seq(0.2, 0.9), kFb = 3, mExp = 2, k = 5)
      .select(col("alpha"), col("doc_id"), col("rnk"), col("score"))
      .as[(Double, Long, Long, Double)].collect()
    assert(curve.map(_._1).distinct.sorted.toSeq == Seq(0.2, 0.9))
    // the knob's direction: the alpha-free doc 4 lives off expansion
    // mass alone, so its score is linear in (1 - alpha) and must fall
    // strictly as alpha rises
    def score4(a: Double) = curve.filter(_._1 == a).find(_._2 == 4L).get._4
    assert(score4(0.9) < score4(0.2),
      s"doc 4 score must fall with alpha: ${score4(0.2)} -> ${score4(0.9)}")
    // and every alpha-doc keeps a row at both settings (original terms
    // never lose all their mass: alpha > 0)
    assert(Seq(0.2, 0.9).forall(a =>
      Set(1L, 2L, 3L).subsetOf(curve.filter(_._1 == a).map(_._2).toSet)))
    // the alpha-free doc stays retrievable at every alpha (expansion
    // mass never vanishes: alpha < 1), and the unrelated doc never
    // enters
    assert(Seq(0.2, 0.9).forall(a =>
      curve.filter(_._1 == a).exists(_._2 == 4L)))
    assert(!curve.exists(_._2 == 5L))
  }

  test("rm3Curve: multi-alpha pass equals single-alpha runs; agrees with rm3 per alpha") {
    val docs = Seq(
      (1L, "alpha beta beta beta x"),
      (2L, "alpha beta beta y y"),
      (3L, "alpha beta z z z"),
      (4L, "beta beta beta w w"),
      (5L, "gamma delta gamma delta")
    ).toDF("doc_id", "text")
    val alphas = Seq(0.2, 0.6, 0.9)
    def run(as: Seq[Double]) = TextSearch
      .rm3Curve(docs, "doc_id", "text", Seq("alpha"), alphas = as,
        kFb = 3, mExp = 2, k = 5)
      .select(col("alpha"), col("doc_id"), col("score"), col("rnk"))
      .as[(Double, Long, Double, Long)].collect()
    // the shared contribution table serves every alpha; each single-alpha
    // call is the same arithmetic over a one-point curve — identical rows
    val multi = run(alphas)
    assert(multi.toSet == alphas.flatMap(a => run(Seq(a))).toSet)
    // and the hoisted c0·wt order agrees with rm3's wt·idf·sat order on
    // every (doc, rank); scores match to well under the 6-dp rounding
    alphas.foreach { a =>
      val viaRm3 = TextSearch
        .rm3(docs, "doc_id", "text", Seq("alpha"),
          kFb = 3, mExp = 2, alpha = a, k = 5)
        .select(col("doc_id"), col("score"), col("rnk"))
        .as[(Long, Double, Long)].collect().sortBy(_._3)
      val viaCurve = multi.filter(_._1 == a)
        .map(r => (r._2, r._3, r._4)).sortBy(_._3)
      assert(viaCurve.map(r => (r._1, r._3)).toSeq ==
        viaRm3.map(r => (r._1, r._3)).toSeq,
        s"alpha $a: docs/ranks diverged")
      viaCurve.zip(viaRm3).foreach { case ((_, s1, _), (_, s2, _)) =>
        assert(math.abs(s1 - s2) < 1.1e-6, s"alpha $a: $s1 vs $s2")
      }
    }
  }

  test("combFuse: hand-computed min-max norms, SUM and MNZ, constant list -> 0") {
    // list A: scores 10/5/0 over docs 1/2/3 -> norms 1.0/0.5/0.0
    // list B: scores 2/2 over docs 2/4 -> constant -> norm 0 for both
    // list C: scores 4/1 over docs 1/4 -> norms 1.0/0.0
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 0.0)).toDF("doc_id", "score")
    val b = Seq((2L, 2.0), (4L, 2.0)).toDF("doc_id", "score")
    val c = Seq((1L, 4.0), (4L, 1.0)).toDF("doc_id", "score")
    val got = TextSearch
      .combFuse(Seq("a" -> a, "b" -> b, "c" -> c), k = 10)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    // doc 1: 1.0 (A) + 1.0 (C), 2 lists -> sum 2.0, mnz 4.0, rnk 1
    assert(got(1L) == ((2.0, 4.0, 2L, 1L)), got(1L))
    // doc 2: 0.5 (A) + 0.0 (B), 2 lists -> sum 0.5, mnz 1.0, rnk 2
    assert(got(2L) == ((0.5, 1.0, 2L, 2L)), got(2L))
    // doc 3: 0.0 in A only -> sum 0, mnz 0; doc 4: 0 (B) + 0 (C) -> 0
    // ties at 0 break by doc_id: 3 before 4
    assert(got(3L) == ((0.0, 0.0, 1L, 3L)), got(3L))
    assert(got(4L) == ((0.0, 0.0, 2L, 4L)), got(4L))
  }

  test("bm25Weighted: unit weights reproduce plain bm25 exactly") {
    val docs = Seq(
      (1L, "alpha beta beta"), (2L, "alpha alpha x"), (3L, "y z alpha")
    ).toDF("doc_id", "text")
    val plain = TextSearch.bm25(docs, "doc_id", "text", Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val unit = TextSearch.bm25Weighted(
      docs, "doc_id", "text", Seq("alpha" -> 1.0, "beta" -> 1.0))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(unit == plain)
  }
}
