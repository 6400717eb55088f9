package graft

import org.apache.spark.sql.SparkSession

/** The SQL surface registered by [[GraftExtensions]]. Separate session —
  * extensions bind at builder time.
  */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("graft_l2sq / graft_dot / graft_topk usable from spark.sql") {
    spark.sparkContext.setLogLevel("WARN")
    val r = spark
      .sql("SELECT graft_l2sq(array(1D,2D,3D), array(4D,5D,6D)) AS d, " +
        "graft_dot(array(1D,2D), array(3D,4D)) AS p")
      .head()
    assert(r.getDouble(0) == 27.0)
    assert(r.getDouble(1) == 11.0)

    spark.sql(
      "SELECT * FROM VALUES (1L, 5.0D, 10L), (1L, 1.0D, 11L), (1L, 3.0D, 12L) " +
        "AS t(g, dist, id)"
    ).createOrReplaceTempView("pairs")
    val tk = spark
      .sql("SELECT g, graft_topk(dist, id, 2) AS tk FROM pairs GROUP BY g")
      .head()
    val entries = tk.getSeq[org.apache.spark.sql.Row](1)
    assert(entries.map(_.getLong(1)) == Seq(11L, 12L))
    assert(entries.map(_.getDouble(0)) == Seq(1.0, 3.0))
  }
}
