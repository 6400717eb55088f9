package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 is declared as a [[GQuery]]
  * in one of the graft.queries modules; this object flattens them into the
  * driver's (queries, oracleSql) maps.
  */
object SparkEntry {

  private def modules: Seq[GQuery] =
    RelationalQueries.all ++ EventQueries.all ++ VectorQueries.all ++
      PQQueries.all ++ SQQueries.all ++ BQQueries.all ++ HnswQueries.all ++
      TextQueries.all ++
      IvfQueries.all ++ MultimodalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact kNN over the embeddings table — the reference's core capability
    * (py/bruteforce.py) as a Spark similarity join + bounded top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_bruteforce")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (the driver
    * then records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
