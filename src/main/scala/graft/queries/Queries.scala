package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: a Spark DataFrame program plus (when
  * SQL-expressible) an equivalent ANSI/DuckDB oracle. Column names and types
  * must match exactly between the two — the driver sorts columns by name and
  * hash-compares values.
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {

  /** Load one driver test table from the given sf dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Load the events table, normalizing `ts` to a session-TZ (UTC)
    * TIMESTAMP whatever the parquet physical type is:
    *  - TIMESTAMP(NANOS) (older driver data): the vectorized reader
    *    rejects it — read nanos as long and truncate to microsecond
    *    timestamps (integer division, matching DuckDB's own ns→us
    *    truncation when it loads the same file);
    *  - TIMESTAMP(MICROS) without timezone (current driver data): Spark
    *    reads TIMESTAMP_NTZ — cast to TIMESTAMP, which under the UTC
    *    session zone is epoch-identical to DuckDB's reading of the same
    *    file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Order-insensitive exact double sum: route through a decimal so the
    * aggregation is exact regardless of partial-aggregation order, then cast
    * back to double. The DuckDB oracle mirrors it as
    * `sum((expr)::DECIMAL(30,6))::DOUBLE` — both sides are bit-identical.
    * Plain `sum(double)` would differ between engines in the last ulps
    * because float addition is order-dependent.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  /** Exact mean built from the exact sum — `dsum / count` so both engines
    * divide the same two numbers.
    */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(30, 6))).cast("double") / count(lit(1)))

  /** The DuckDB spellings of the same. */
  def sqlSum(expr: String): String = s"sum(($expr)::DECIMAL(30,6))::DOUBLE"
  def sqlAvg(expr: String): String =
    s"(sum(($expr)::DECIMAL(30,6))::DOUBLE / count(*))"

  /** High-scale variants for unit-magnitude values (embedding components):
    * scale 30 keeps float-derived doubles to well past their precision.
    */
  def davgHi(c: Column): Column =
    (sum(c.cast(DecimalType(38, 30))).cast("double") / count(lit(1)))
  def sqlAvgHi(expr: String): String =
    s"(sum(($expr)::DECIMAL(38,30))::DOUBLE / count(*))"

  /** DuckDB spelling of [[graft.functions.VectorFunctions.l2Sq]] over
    * double[] columns (left-to-right accumulation, same as Spark's
    * `aggregate(zip_with(...))`).
    */
  def sqlL2Sq(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> ($a[i]-$b[i])*($a[i]-$b[i])))"

  def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]*$b[i]))"
}
