package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.queries.Q

/** Invariants for the hashing-trick TF-IDF featurizer. */
class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  private def md5Bucket(w: String, b: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 14)
    java.lang.Long.parseLong(hex, 16) % b
  }

  test("buckets, counts and idf match an independent spelling") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple apple apple")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedTfidf(docs, "doc_id", "text", 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // independent reference
    val corpus = Map(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "cherry", "date"),
      3L -> Seq("apple", "apple", "apple"))
    val tf = corpus.toSeq.flatMap { case (id, ws) =>
      ws.groupBy(w => md5Bucket(w, 16)).map { case (b, g) => ((id, b), g.size.toLong) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val dfb = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = 3.0
    assert(got.keySet == tf.keySet)
    got.foreach { case (k, (t, w)) =>
      assert(t == tf(k), s"tf mismatch at $k")
      val want = t * math.log(n / dfb(k._2))
      assert(math.abs(w - want) < 1e-12, s"tfidf mismatch at $k: $w vs $want")
    }
    // per-doc tf mass = token count
    val mass = got.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._1).sum).toMap
    assert(mass == Map(1L -> 4L, 2L -> 4L, 3L -> 3L))
  }

  test("row-local spelling matches the batch featurizer under frozen idf") {
    val docs = Q.t(spark, sf0001, "documents").select(col("doc_id"), col("text"))
    val batch = TextAnalysis.hashedTfidf(docs, "doc_id", "text", 16)
      .localCheckpoint()
    // rebuild idf with the operator's own arithmetic (ln(N / df_bucket))
    // — THROUGH Spark's ln, not scala math.log: Spark's Log expression
    // is StrictMath-backed and differs from the JVM intrinsic by 1 ulp
    // on some inputs, which would break bit-equality
    val nDocs = docs.count().toDouble
    val idf = batch.groupBy(col("bucket")).agg(count(lit(1)).as("dfb"))
      .select(col("bucket"), log(lit(nDocs) / col("dfb")).as("idf"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = TextAnalysis.hashedTfidfRow(docs, "doc_id", "text", idf, 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b, s"row-local featurizer diverged: ${(a -- b).take(3)} / ${(b -- a).take(3)}")
  }

  test("lsa: deterministic across runs, scores carry real spread") {
    val a = SparkEntry.queries("text_lsa")(spark, sf0001)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("text_lsa")(spark, sf0001)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "LSA trajectory not deterministic")
    val t1 = a.map(_(1).asInstanceOf[Double])
    val t2 = a.map(_(2).asInstanceOf[Double])
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    // the first latent direction must explain at least as much score
    // variance as the second (greedy deflation order), and both must be
    // non-degenerate on a real corpus
    assert(variance(t1) >= variance(t2), s"${variance(t1)} < ${variance(t2)}")
    assert(variance(t2) > 0.0)
  }
}
