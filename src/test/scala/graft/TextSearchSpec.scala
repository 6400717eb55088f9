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
}
