package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Q._

/** Relational EXT query surface over the TPC-H-ish star schema + events
  * (SURVEY.md §2 C5-C8, D9-D10, E3, E6, F9). Thin compositions of Spark
  * built-ins — Catalyst handles pushdown / join selection / partial
  * aggregation; aggregates use the decimal-exact [[Q.dsum]] pattern so the
  * DuckDB oracle hashes bit-identically.
  */
object RelationalQueries {

  val all: Seq[GQuery] = Seq(
    // D9: grouped aggregation, TPC-H Q1 style pricing summary
    GQuery(
      "q1_pricing_summary",
      (spark, dir) => {
        val li = t(spark, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("sum_disc_price"),
            dsum(
              col("l_extendedprice") * (lit(1) - col("l_discount"))
                * (lit(1) + col("l_tax"))
            ).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${sqlSum("l_quantity")} AS sum_qty,
               ${sqlSum("l_extendedprice")} AS sum_base_price,
               ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               ${sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
               ${sqlAvg("l_quantity")} AS avg_qty,
               ${sqlAvg("l_extendedprice")} AS avg_price,
               ${sqlAvg("l_discount")} AS avg_disc,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
      """)
    ),
    // C5: multi-way equi-join through the star schema (orders->customer->
    // nation->region), filtered + aggregated. nation/region/customer are
    // broadcast-sized dims at any sf.
    GQuery(
      "q2_revenue_by_region",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        val c = t(spark, dir, "customer")
        val n = t(spark, dir, "nation")
        val r = t(spark, dir, "region")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(o("o_orderstatus") =!= "F")
          .groupBy(col("r_name"))
          .agg(
            dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"),
            countDistinct(col("c_custkey")).as("n_customers")
          )
      },
      Some(s"""
        SELECT r_name,
               ${sqlSum("o_totalprice")} AS revenue,
               count(*)::BIGINT AS n_orders,
               count(DISTINCT c_custkey)::BIGINT AS n_customers
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderstatus <> 'F'
        GROUP BY r_name
      """)
    )
  )
}
