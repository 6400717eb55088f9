package graft

import org.apache.spark.sql.functions._

import graft.operators.TextRank

/** Invariants for TextRank keyword extraction (Mihalcea & Tarau 2004):
  * the co-occurrence graph against a hand-built reference, rank values
  * against an independent dense power iteration (with dangling
  * redistribution), candidate filtering, salience closed forms, and
  * partition determinism.
  */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "deep graph models rank deep graph nodes"),
    (2L, "rank models rank graph walks and select data"),
    (3L, "of to is in at graph"),
    (4L, "lonely")
  ).toDF("doc_id", "text")

  /** Independent reference: build the undirected co-occurrence graph
    * from the filtered token streams by hand, then run dense PageRank
    * with the dangling-mass convention. Plain-double arithmetic — the
    * operator's decimal routing must agree to well past 1e-9.
    */
  private def refModel(
      docs: Seq[Seq[String]],
      window: Int,
      rounds: Int
  ): (Set[(String, String)], Map[String, Double]) = {
    val nodes = docs.flatten.distinct.sorted
    val edges = (for {
      doc <- docs
      i <- doc.indices
      d <- 1 to window
      if i + d < doc.length
      if doc(i) != doc(i + d)
    } yield (doc(i), doc(i + d))).toSet
    val und = edges.flatMap { case (a, b) => Set(a -> b, b -> a) }
    val out = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = nodes.size
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to rounds) {
      val dang = nodes.filterNot(out.contains).map(pr).sum
      pr = nodes.map { v =>
        val s = und.toSeq.collect { case (u, `v`) => pr(u) / out(u).size }.sum
        v -> ((1.0 - 0.85) / n + 0.85 * (s + dang / n))
      }.toMap
    }
    (edges, pr)
  }

  // the filtered candidate streams of `corpus` at minLen=3, minCount=1
  private val filteredDocs = Seq(
    Seq("deep", "graph", "models", "rank", "deep", "graph", "nodes"),
    Seq("rank", "models", "rank", "graph", "walks", "and", "select", "data"),
    Seq("graph"),
    Seq("lonely"))

  test("co-occurrence edges match the hand reference (window 2)") {
    val got = TextRank
      .cooccurrenceEdges(corpus, "doc_id", "text",
        window = 2, minCount = 1, minLen = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    def wid(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(w.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString, 16)
    }
    val (edges, _) = refModel(filteredDocs, window = 2, rounds = 3)
    assert(got == edges.map { case (a, b) => (wid(a), wid(b)) })
    // the length filter dropped every short stopword token
    assert(!edges.exists { case (a, b) => a.length < 3 || b.length < 3 })
  }

  test("keyword ranks agree with independent dense PageRank (dangling live)") {
    val got = TextRank
      .keywords(corpus, "doc_id", "text",
        window = 2, minCount = 1, minLen = 3, rounds = 3, topK = 100)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val (_, ref) = refModel(filteredDocs, window = 2, rounds = 3)
    assert(got.length == ref.size)
    // 'lonely' is an isolated vocabulary node: its mass must have been
    // redistributed, not dropped — total mass conserved at 1
    assert(math.abs(ref.values.sum - 1.0) < 1e-12)
    got.foreach { case (_, w, pr) =>
      assert(math.abs(pr - ref(w)) < 5e-7, s"$w: $pr vs ${ref(w)}")
    }
    // ranking = ref ordering (pr desc, word asc)
    val want = ref.toSeq.sortBy { case (w, p) => (-p, w) }.map(_._1)
    assert(got.sortBy(_._1).map(_._2).toSeq == want)
  }

  test("minCount prunes rare words from nodes and edges") {
    val kws = TextRank
      .keywords(corpus, "doc_id", "text",
        window = 2, minCount = 2, minLen = 3, rounds = 1, topK = 100)
      .collect()
      .map(_.getString(1))
      .toSet
    assert(kws == Set("deep", "graph", "models", "rank"))
  }

  test("salience: closed form with multiplicity, misses scoring zero") {
    val kw = Map("graph" -> 0.5, "rank" -> 0.25)
    val got = TextRank
      .salience(
        Seq((7L, "graph rank graph zzz"), (8L, "none here")).toDF("id", "t"),
        "id", "t", kw)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set((7L, 3L, 1.25), (8L, 0L, 0.0)))
  }

  test("keywords are partition-invariant") {
    val a = TextRank
      .keywords(corpus, "doc_id", "text",
        window = 2, minCount = 1, minLen = 3, rounds = 3, topK = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val b = TextRank
      .keywords(corpus.repartition(7), "doc_id", "text",
        window = 2, minCount = 1, minLen = 3, rounds = 3, topK = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
