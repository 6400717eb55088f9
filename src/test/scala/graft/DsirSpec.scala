package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir
import graft.queries.Q

/** Invariants for DSIR importance resampling. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importanceWeights: hand-computed two-doc fixture") {
    // raw = {"a a", "b b"}, target = {"a a"}; features per doc: 2
    // unigrams + 1 bigram. With B buckets the buckets of 'a'/'a a' get
    // target mass, 'b'/'b b' none.
    val raw = Seq((1L, "a a"), (2L, "b b")).toDF("id", "text")
    val tgt = Seq((10L, "a a")).toDF("id", "text")
    val B = 512
    val got = Dsir.importanceWeights(raw, tgt, "id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def bucket(s: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 14)
      (java.lang.Long.parseLong(hex, 16) % B).toInt
    }
    // target counts: bucket(a) x2, bucket(a a) x1 (tt=3); raw counts:
    // those plus bucket(b) x2, bucket(b b) x1 (rt=6)
    val ct = Map(bucket("a") -> 2L, bucket("a a") -> 1L)
      .withDefaultValue(0L)
    val cr = Map(bucket("a") -> 2L, bucket("a a") -> 1L,
      bucket("b") -> 2L, bucket("b b") -> 1L).withDefaultValue(0L)
    def term(b: Int): Double =
      math.log((ct(b) + 1).toDouble / (3 + B)) -
        math.log((cr(b) + 1).toDouble / (6 + B))
    val w1 = term(bucket("a")) + term(bucket("a")) + term(bucket("a a"))
    val w2 = term(bucket("b")) + term(bucket("b")) + term(bucket("b b"))
    assert(math.abs(got(1L) - w1) < 1e-12, s"${got(1L)} vs $w1")
    assert(math.abs(got(2L) - w2) < 1e-12, s"${got(2L)} vs $w2")
    assert(got(1L) > got(2L), "target-like doc must outweigh the other")
  }

  test("DSIR pulls the selection toward the target slice") {
    val docs = Q.t(spark, sf0001, "documents")
    val tgt = docs.filter(col("source") === "src0")
    val w = Dsir.importanceWeights(docs, tgt, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val Array(inT, outT) = w
      .groupBy(col("source") === "src0")
      .agg(avg(col("logw")))
      .orderBy(col("source") === "src0")
      .collect().map(_.getDouble(1))
    // ordered false, true: target-source docs must average higher
    assert(outT > inT, s"target avg $outT <= rest avg $inT")
    val sel = Dsir.resample(docs, tgt, "doc_id", "text", n = 20)
    val rows = sel.collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(3)).toSeq == (1L to 20L),
      "rnk must be 1..n in order")
    val selIds = rows.map(_.getLong(0)).toSet
    val allIds = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(selIds.subsetOf(allIds) && selIds.size == 20)
  }
}
