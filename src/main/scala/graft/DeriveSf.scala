package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derived scale factor (r13 verdict item #1): replicate
  * the driver's sf0.1 tables one more decade so the SCALE.md exponent
  * table can be re-fit at sf0.1 → sf1, where BOTH rungs clear Spark's
  * per-job floor. The driver's own generator is read-only, so sf1 is
  * derived, never synthesized: each copy `i` is the source table with
  * every key column offset by `i × (max(key)+1)` — a closed world per
  * copy, so every FK (orders→customer, lineitem→orders/part/supplier,
  * events→user space) stays internally consistent and every join/agg
  * semantics is the source's, just ×copies.
  *
  * Per-table scaling follows the driver's OWN observed sf0.01 → sf0.1
  * ratios: region/nation fixed (dimension tables), everything else ×10,
  * embeddings ×4 (500 → 2000 in the source ladder).
  *
  * Content perturbation is deterministic (Spark murmur3 `hash` / `md5`
  * over ids only — no RNG, no time):
  *   - documents: copy 0 verbatim; copies i>0 append a per-doc salt
  *     token, so cross-copy pairs are NEAR-duplicates, not exact ones —
  *     each doc gains copies−1 near-dup twins (a realistic web-corpus
  *     duplication profile; candidate-pair growth stays LINEAR in corpus
  *     size: bounded family size per doc). n_chars is recomputed.
  *   - embeddings: copy 0 verbatim (so `vec_id < nCells` centroid seeds
  *     and `vec_id % 10` query panels keep their semantics); copies i>0
  *     get ±0.02 per-element hash noise, so copies are near-neighbors,
  *     never zero-distance duplicates that would degenerate kNN ranks.
  */
object DeriveSf {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "/root/repo/testdata_sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val embCopies = sys.env.getOrElse("SPARK_GRAFT_EMB_COPIES", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def write(df: DataFrame, n: String, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"derived $n: ${spark.read.parquet(s"$out/$n.parquet").count()} rows")
    }
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).first().getLong(0) + 1L

    /** Union of `n` copies with each key column offset by i×span. */
    def replicate(df: DataFrame, n: Int, keys: Seq[(String, Long)])(
        tweak: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until n).map { i =>
        val shifted = keys.foldLeft(df) { case (d, (k, s)) =>
          d.withColumn(k, col(k) + lit(i * s))
        }
        tweak(shifted, i)
      }.reduce(_ unionAll _)

    // dimension tables: fixed across scale factors, verbatim
    write(tbl("region"), "region", 1)
    write(tbl("nation"), "nation", 1)

    val cust = tbl("customer"); val nCust = span(cust, "c_custkey")
    val supp = tbl("supplier"); val nSupp = span(supp, "s_suppkey")
    val part_ = tbl("part"); val nPart = span(part_, "p_partkey")
    val ord = tbl("orders"); val nOrd = span(ord, "o_orderkey")
    val li = tbl("lineitem")
    val ev = tbl("events")
    val nEvt = span(ev, "event_id"); val nUser = span(ev, "user_id")
    val doc = tbl("documents"); val nDoc = span(doc, "doc_id")
    val emb = tbl("embeddings"); val nVec = span(emb, "vec_id")

    write(replicate(cust, copies, Seq("c_custkey" -> nCust))(), "customer", 4)
    write(replicate(supp, copies, Seq("s_suppkey" -> nSupp))(), "supplier", 2)
    write(replicate(part_, copies, Seq("p_partkey" -> nPart))(), "part", 4)
    write(replicate(ord, copies,
      Seq("o_orderkey" -> nOrd, "o_custkey" -> nCust))(), "orders", 8)
    write(replicate(li, copies,
      Seq("l_orderkey" -> nOrd, "l_partkey" -> nPart, "l_suppkey" -> nSupp))(),
      "lineitem", 32)
    write(replicate(ev, copies,
      Seq("event_id" -> nEvt, "user_id" -> nUser))(), "events", 16)

    write(replicate(doc, copies, Seq("doc_id" -> nDoc)) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("text",
          concat(col("text"), lit(s" c$i "),
            substring(md5(concat(col("doc_id").cast("string"), lit(s":$i"))), 1, 8)))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents", 16)

    write(replicate(emb, embCopies, Seq("vec_id" -> nVec)) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        expr(s"transform(embedding, (x, j) -> " +
          s"cast(x + (pmod(hash(vec_id, j, $i), 2001) - 1000) / 50000.0 as float))"))
    }, "embeddings", 8)

    spark.stop()
  }
}
