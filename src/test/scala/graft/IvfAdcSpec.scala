package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{IvfAdc, PQModel, ProductQuantizer}
import graft.queries.Q

/** IVFADC invariants beyond the ivfadc_knn oracle: with every cell probed
  * the result equals brute-force ADC over residual codes, the disk path
  * equals the in-memory path, and codes beat raw storage by ~8x per the
  * M-byte layout.
  */
class IvfAdcSpec extends SparkSpec {

  private lazy val emb = Q.t(spark, sf0001, "embeddings")
    .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
  private lazy val cents = emb
    .filter(col("vec_id") < 8).orderBy(col("vec_id"))
    .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
  private lazy val model: PQModel = {
    val rows = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
    PQModel(8, 4, 64, Array.tabulate(8)(mi =>
      rows.map(v => java.util.Arrays.copyOfRange(v, mi * 8, (mi + 1) * 8))))
  }
  private lazy val queries = emb
    .filter(col("vec_id") % 25 === 0)
    .select(col("vec_id").as("query_id"), col("vec").as("qv"))

  test("nprobe = nCells equals brute-force ADC over residual codes") {
    val index = IvfAdc.encode(spark, emb, "vec_id", "vec", cents, model)
    val full = IvfAdc.search(
      spark, index, queries, "query_id", "qv", cents, model,
      k = 5, nprobe = cents.length)
    // independent spelling: decode-free per-pair ADC on the same residuals
    val centsDf = {
      import spark.implicits._
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "cvec")
    }
    val qres = queries
      .crossJoin(broadcast(centsDf))
      .withColumn("qresid", expr("zip_with(qv, cvec, (x, y) -> x - y)"))
      .select(col("query_id"), col("cell"),
        ProductQuantizer.lutCol(model, col("qresid")).as("lut"))
    val naive = index
      .join(qres, "cell")
      .withColumn("dist",
        ProductQuantizer.adcFromLutCol(model, col("lut"), col("code")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(col("dist"), col("id"), 5).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.id").as("neighbor_id"))
    assert(full.select(col("query_id"), col("neighbor_id"))
      .except(naive).count() == 0)
  }

  test("rerank: exact distances, recall >= plain ADC, full shortlist == exact scan") {
    val index = IvfAdc.encode(spark, emb, "vec_id", "vec", cents, model)
    val nprobe = cents.length // isolate the rerank effect from probe loss
    // with the shortlist covering every candidate, rerank IS the exact
    // brute-force top-k (probed cells = all cells here)
    val total = emb.count().toInt
    val rer = IvfAdc.searchRerank(
      spark, index, queries, "query_id", "qv", cents, model,
      k = 5, kShort = total, nprobe = nprobe, emb, "vec_id", "vec")
    val exact = graft.operators.BruteForceKNN
      .knn(queries, emb.select(col("vec_id").as("neighbor_id"),
        col("vec").as("bv")), 5)
      .select(col("query_id"), col("neighbor_id"))
    assert(rer.select(col("query_id"), col("neighbor_id"))
      .except(exact).count() == 0)
    // at a realistic shortlist, recall@5 vs exact must be >= plain ADC's
    def recall(r: org.apache.spark.sql.DataFrame): Double = {
      val hits = r.select(col("query_id"), col("neighbor_id"))
        .intersect(exact).count().toDouble
      hits / exact.count()
    }
    val short = IvfAdc.searchRerank(
      spark, index, queries, "query_id", "qv", cents, model,
      k = 5, kShort = 15, nprobe = nprobe, emb, "vec_id", "vec")
    val adc = IvfAdc.search(
      spark, index, queries, "query_id", "qv", cents, model, 5, nprobe)
    assert(recall(short) >= recall(adc),
      s"rerank recall ${recall(short)} < adc ${recall(adc)}")
  }

  test("searchPartitioned == in-memory search, and the scan partition-prunes") {
    val path = java.nio.file.Files.createTempDirectory("ivfadc").toString + "/idx"
    IvfAdc.build(spark, emb, "vec_id", "vec", cents, model, path)
    val mem = IvfAdc.search(
      spark, IvfAdc.encode(spark, emb, "vec_id", "vec", cents, model),
      queries, "query_id", "qv", cents, model, k = 5, nprobe = 3)
    val disk = IvfAdc.searchPartitioned(
      spark, path, queries, "query_id", "qv", cents, model, k = 5, nprobe = 3)
    assert(mem.except(disk).count() == 0 && disk.except(mem).count() == 0)
    val ep = disk.queryExecution.executedPlan.toString
    val scanLine = ep.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.contains("IN ("), s"no cell partition filter:\n$ep")
  }

  test("searchPartitioned scans the query batch exactly once (single probe evaluation)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("ivfadc1p").toString + "/idx"
    IvfAdc.build(spark, emb, "vec_id", "vec", cents, model, path)
    // before the shared-probe fix this path evaluated the probe subtree
    // three times (partition-filter collect + probeCells inside search +
    // the LUT join); the contract is exactly one pass over the batch
    val acc = spark.sparkContext.longAccumulator("ivfadc-query-batch-scans")
    val counted = queries
      .repartition(1)
      .as[(Long, Seq[Double])]
      .mapPartitions { it => acc.add(1); it }
      .toDF("query_id", "qv")
    val res = IvfAdc.searchPartitioned(
      spark, path, counted, "query_id", "qv", cents, model, k = 5, nprobe = 3)
    assert(res.count() > 0)
    assert(acc.value == 1L, s"query batch evaluated ${acc.value} times")
  }

  test("upsert/delete: maintained residual-code index answers like the live corpus") {
    val path = java.nio.file.Files
      .createTempDirectory("ivfadcmaint").toString + "/idx"
    IvfAdc.build(
      spark, emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "vec",
      cents, model, path)
    IvfAdc.upsert(
      spark, path, emb.filter(col("vec_id") % 5 === 0), "vec_id", "vec",
      cents, model)
    IvfAdc.delete(
      spark, path, emb.filter(col("vec_id") % 7 === 0).select(col("vec_id")))
    val live = emb.filter(col("vec_id") % 7 =!= 0)
    val expected = IvfAdc.search(
      spark, IvfAdc.encode(spark, live, "vec_id", "vec", cents, model),
      queries, "query_id", "qv", cents, model, k = 5, nprobe = 3)
    val maintained = IvfAdc.searchPartitioned(
      spark, path, queries, "query_id", "qv", cents, model, k = 5, nprobe = 3)
    assert(maintained.except(expected).count() == 0
      && expected.except(maintained).count() == 0)
    // compaction is layout-agnostic: results invariant, log gone
    IvfAdc.compact(spark, path)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".log")))
    val compacted = IvfAdc.searchPartitioned(
      spark, path, queries, "query_id", "qv", cents, model, k = 5, nprobe = 3)
    assert(compacted.except(expected).count() == 0
      && expected.except(compacted).count() == 0)
  }

  test("index stores M shorts per vector (the 100-TB compression argument)") {
    val index = IvfAdc.encode(spark, emb, "vec_id", "vec", cents, model)
    val row = index.head()
    assert(row.getSeq[Short](row.fieldIndex("code")).length == model.m)
    assert(index.count() == emb.count())
  }
}
