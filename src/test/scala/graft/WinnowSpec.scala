package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Invariants for winnowing fingerprints (Schleimer–Wilkerson–Aiken
  * 2003): exact agreement with an independent reference implementation,
  * the ≥ w+k−1 shared-substring guarantee, and the capped-pair
  * discipline.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex8(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.take(8)
  }

  /** Independent robust-winnowing reference: per window of w consecutive
    * k-gram hashes select the min (rightmost on ties), dedupe.
    */
  private def refWinnow(text: String, k: Int, w: Int): Set[(Long, String)] = {
    val m = text.length - k + 1
    if (m < 1) return Set.empty
    val hs = (1 to m).map(p => md5hex8(text.substring(p - 1, p - 1 + k)))
    (1 to math.max(1, m - w + 1)).map { i =>
      val end = math.min(m, i + w - 1)
      var best = i
      (i to end).foreach { q =>
        if (hs(q - 1) < hs(best - 1) ||
          (hs(q - 1) == hs(best - 1) && q > best)) best = q
      }
      (best.toLong, hs(best - 1))
    }.toSet
  }

  private val K = 5
  private val W = 4

  test("fingerprints match the reference exactly (incl. ties, short docs)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaa"), // all-equal hashes: pure tie-breaking
      (3L, "abcabcabcabcabc"), // periodic: repeated hash values
      (4L, "tiny"), // shorter than k: no fingerprints
      (5L, "exact"), // m = 1 < w: single global min
      (6L, "sevench") // m = 3 < w: still one window
    ).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", K, W)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, txt) =>
      val want = refWinnow(txt, K, W)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
    assert(!got.contains(4L))
  }

  test("guarantee: any shared substring of length >= w+k-1 shares a fingerprint") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 20).foreach { trial =>
      val core = randStr(W + K - 1) // exactly the guarantee threshold
      val a = randStr(rnd.nextInt(40)) + core + randStr(rnd.nextInt(40))
      val b = randStr(rnd.nextInt(40)) + core + randStr(rnd.nextInt(40))
      val fa = refWinnow(a, K, W).map(_._2)
      val fb = refWinnow(b, K, W).map(_._2)
      assert((fa & fb).nonEmpty, s"trial $trial: no shared fingerprint\n$a\n$b")
      // and the Spark side agrees with the reference on both docs
      val got = Dedup
        .winnowFingerprints(Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
          "doc_id", "text", K, W)
        .collect().map(r => r.getLong(0) -> r.getString(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(got(1L) == refWinnow(a, K, W).map(_._2))
      assert(got(2L) == refWinnow(b, K, W).map(_._2))
    }
  }

  test("density: selected fraction is near 2/(w+1), never above 1 per window") {
    val rnd = new scala.util.Random(7)
    val txt = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val m = txt.length - K + 1
    val n = refWinnow(txt, K, W).size
    val density = n.toDouble / m
    assert(density > 1.0 / W - 0.05 && density < 2.0 / (W + 1) + 0.1,
      s"density $density out of range for w=$W")
  }

  test("pairs: identical docs score 1.0 under any cap; boilerplate-only overlap is no pair") {
    val boiler = "this common boilerplate header appears everywhere in the corpus"
    val rnd = new scala.util.Random(3)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val bodyA = randStr(120)
    val docs = (
      Seq((1L, boiler + " " + bodyA), (2L, boiler + " " + bodyA)) ++ // true dups
        (3L to 40L).map(i => (i, boiler + " " + randStr(120)))
    ).toDF("doc_id", "text")
    // cap below the boilerplate's df (40 docs): its fingerprints leave
    // the scoring universe entirely — the identical pair (1,2) still
    // scores exactly 1.0 off its body, and no other pair rises anywhere
    // near dup level (random bodies share the odd coincidental 5-gram,
    // jaccard ~0.01; the boilerplate adds NOTHING to any score)
    val capped = Dedup
      .winnowPairs(docs, "doc_id", "text", K, W, tau = 1e-9, maxDfAbs = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val p12 = capped.find(t => t._1 == 1L && t._2 == 2L).get
    assert(p12._3 == 1.0, s"identical docs must score 1.0: $p12")
    capped.filterNot(t => t._1 == 1L && t._2 == 2L).foreach(t =>
      assert(t._3 < 0.05, s"capped score inflated by boilerplate: $t"))
    // with the cap above the boilerplate's df, every doc pairs with every
    // other through the shared header at a substantial score — the
    // inflation the cap removes
    val uncapped = Dedup
      .winnowPairs(docs, "doc_id", "text", K, W, tau = 0.1, maxDfAbs = 1000000)
      .collect()
    assert(uncapped.length > 100,
      s"uncapped boilerplate should pair broadly at tau=0.1, got ${uncapped.length}")
    // at a meaningful tau the capped run keeps exactly the true dup
    val strict = Dedup
      .winnowPairs(docs, "doc_id", "text", K, W, tau = 0.5, maxDfAbs = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.toSeq == Seq((1L, 2L)), s"got ${strict.toSeq}")
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(11)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = (1L to 30L).map(i => (i, randStr(100 + rnd.nextInt(100))))
    val a = Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .orderBy("doc_id", "pos").collect().toSeq
    val b = Dedup.winnowFingerprints(
      docs.toDF("doc_id", "text").repartition(17), "doc_id", "text", K, W)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(a == b)
  }
}
