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
    ),
    // C5+E2: TPC-H Q3 shape — 3-way join, grouped revenue, deterministic
    // global top-10. lineitem is the fact side. Only the true dim
    // (segment-filtered customer keys) carries a broadcast hint; the
    // orders-derived side is ~20% of the orders fact table, so hinting it
    // broadcast would OOM executors at scale — lineitem⋈orders is left to
    // AQE, which broadcasts only when the runtime size actually fits.
    GQuery(
      "q3_top_orders",
      (spark, dir) => {
        val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(spark, dir, "orders")
        val li = t(spark, dir, "lineitem")
        val co = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .select(o("o_orderkey"), o("o_orderdate"))
        li.join(co, li("l_orderkey") === co("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue")
          )
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""
        SELECT l_orderkey, o_orderdate,
               ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """)
    ),
    // C6 semi-join: orders having at least one returned line (EXISTS).
    GQuery(
      "q4_priority_semi",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        val li = t(spark, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""
        SELECT o_orderpriority, count(*)::BIGINT AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
      """)
    ),
    // C6 anti-join: dormant customers — no orders since 1998 (NOT
    // EXISTS), per nation. The date cutoff keeps the answer non-empty at
    // every test SF (every customer has SOME order, so an unfiltered
    // anti-join would be trivially empty and the oracle would not
    // discriminate); the filter pushes into the orders scan.
    GQuery(
      "q5_customers_no_orders",
      (spark, dir) => {
        val c = t(spark, dir, "customer")
        val o = t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .join(broadcast(t(spark, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_customers"),
            dsum(col("c_acctbal")).as("total_bal")
          )
      },
      Some(s"""
        SELECT n_name, count(*)::BIGINT AS n_customers,
               ${sqlSum("c_acctbal")} AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY n_name
      """)
    ),
    // D10: rollup over (returnflag, linestatus) — partial+final hash agg,
    // grouping-id distinguishes subtotal rows.
    GQuery(
      "q6_rollup",
      (spark, dir) => {
        val li = t(spark, dir, "lineitem")
        li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"),
            grouping_id().as("gid")
          )
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${sqlSum("l_quantity")} AS sum_qty,
               count(*)::BIGINT AS n,
               grouping(l_returnflag, l_linestatus)::BIGINT AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
      """)
    ),
    // D10: cube over orders dims.
    GQuery(
      "q7_cube",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        o.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            dsum(col("o_totalprice")).as("sum_price"),
            count(lit(1)).as("n"),
            grouping_id().as("gid")
          )
      },
      Some(s"""
        SELECT o_orderstatus, o_orderpriority,
               ${sqlSum("o_totalprice")} AS sum_price,
               count(*)::BIGINT AS n,
               grouping(o_orderstatus, o_orderpriority)::BIGINT AS gid
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
      """)
    ),
    // E6: set operations over customer key sets.
    GQuery(
      "q8_setops",
      (spark, dir) => {
        val c = t(spark, dir, "customer")
        val building = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val rich = c.filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"))
        val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE")
          .select(col("c_custkey"))
        building.union(auto).distinct()
          .intersect(rich)
          .except(building.intersect(auto))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey FROM (
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           UNION
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
          INTERSECT
          SELECT c_custkey FROM customer WHERE c_acctbal > 5000
          EXCEPT
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           INTERSECT
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        ) ORDER BY c_custkey
      """)
    ),
    // D9 distribution stats: exact linear-interpolated percentiles of
    // extendedprice per return flag (both engines use the (n-1)·p
    // continuous-quantile definition). At 100 TB the scale path swaps in
    // approx_percentile (t-digest-style mergeable sketch) with identical
    // plan shape; the exact form is the oracle-checkable twin.
    GQuery(
      "q24_percentiles",
      (spark, dir) =>
        t(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25"),
            round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75"),
            round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90")
          ),
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
        FROM lineitem GROUP BY l_returnflag
      """)
    ),
    // D9 sketch path: approx_count_distinct (HLL++) exercised WITH a
    // correctness role — the output carries only exact-derived columns
    // (so the DuckDB oracle stays engine-portable) while the HAVING-style
    // filter pins the sketch to within 5% of the exact count per group: a
    // broken sketch drops rows and fails the row/hash compare. At 100 TB
    // the sketch is the one that runs (mergeable, fixed memory); the
    // exact twin is the gate.
    GQuery(
      "q25_approx_distinct",
      (spark, dir) =>
        t(spark, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            countDistinct(col("o_custkey")).as("n_exact"),
            approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"),
            count(lit(1)).as("n_orders")
          )
          .filter(
            abs(col("n_approx") - col("n_exact")) <=
              col("n_exact") * lit(0.05))
          .select(col("o_orderpriority"), col("n_exact"), col("n_orders")),
      Some("""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey)::BIGINT AS n_exact,
               count(*)::BIGINT AS n_orders
        FROM orders GROUP BY o_orderpriority
      """)
    ),
    // D9 sketch path, percentile edition: approx_percentile (mergeable
    // t-digest-style sketch) pinned to within 1% of the exact continuous
    // percentile per group — same construction as q25: the output stays
    // exact/portable, the filter gives the sketch a correctness role.
    GQuery(
      "q26_approx_percentile",
      (spark, dir) =>
        t(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_exact"),
            expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_approx"),
            count(lit(1)).as("n_rows")
          )
          .filter(
            abs(col("p50_approx") - col("p50_exact")) <=
              col("p50_exact") * lit(0.01))
          .select(col("l_returnflag"), col("p50_exact"), col("n_rows")),
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
               count(*)::BIGINT AS n_rows
        FROM lineitem GROUP BY l_returnflag
      """)
    ),
    // E3: ranking window — top-3 orders by totalprice per customer.
    GQuery(
      "q9_topk_per_customer",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rnk").cast("long").as("rnk")
          )
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders)
        WHERE rnk <= 3
      """)
    ),
    // D9 scalar-subquery shape: customers above their nation's average
    // balance. The per-nation average is a broadcast-sized agg re-joined to
    // the fact side — no correlated per-row subquery execution.
    GQuery(
      "q10_above_nation_avg",
      (spark, dir) => {
        val c = t(spark, dir, "customer")
        val navg = c.groupBy(col("c_nationkey").as("nk"))
          .agg(davg(col("c_acctbal")).as("nation_avg"))
        c.join(broadcast(navg), col("c_nationkey") === col("nk"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("c_acctbal")).as("sum_bal")
          )
      },
      Some(s"""
        WITH navg AS (
          SELECT c_nationkey AS nk, ${sqlAvg("c_acctbal")} AS nation_avg
          FROM customer GROUP BY c_nationkey)
        SELECT c_mktsegment, count(*)::BIGINT AS n,
               ${sqlSum("c_acctbal")} AS sum_bal
        FROM customer JOIN navg ON c_nationkey = nk
        WHERE c_acctbal > nation_avg
        GROUP BY c_mktsegment
      """)
    ),
    // F9 date functions + D9: order volume by year/month.
    GQuery(
      "q11_orders_by_month",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        o.groupBy(
            year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo")
          )
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("revenue")
          )
      },
      Some(s"""
        SELECT year(o_orderdate)::BIGINT AS yr, month(o_orderdate)::BIGINT AS mo,
               count(*)::BIGINT AS n_orders,
               ${sqlSum("o_totalprice")} AS revenue
        FROM orders GROUP BY 1, 2
      """)
    ),
    // F9 string scalars: case/substring/concat/replace/LIKE over part names.
    GQuery(
      "q18_string_funcs",
      (spark, dir) => {
        val p = t(spark, dir, "part")
        p.filter(col("p_name").like("%a%"))
          .select(
            col("p_partkey"),
            upper(col("p_type")).as("type_upper"),
            lower(col("p_brand")).as("brand_lower"),
            substring(col("p_name"), 1, 5).as("name_head"),
            length(col("p_name")).cast("long").as("name_len"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_name"), " ", "_").as("name_snake")
          )
      },
      Some("""
        SELECT p_partkey,
               upper(p_type) AS type_upper,
               lower(p_brand) AS brand_lower,
               substring(p_name, 1, 5) AS name_head,
               length(p_name)::BIGINT AS name_len,
               p_brand || '/' || p_type AS brand_type,
               replace(p_name, ' ', '_') AS name_snake
        FROM part WHERE p_name LIKE '%a%'
      """)
    ),
    // C5/D9 over the last untouched table: supplier activity — revenue
    // shipped per supplier nation (lineitem ⋈ supplier ⋈ nation).
    GQuery(
      "q23_supplier_activity",
      (spark, dir) => {
        val li = t(spark, dir, "lineitem")
        val s = t(spark, dir, "supplier")
        val n = t(spark, dir, "nation")
        li.join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
          .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            countDistinct(col("s_suppkey")).as("n_suppliers"),
            count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue"),
            davg(col("s_acctbal")).as("avg_supp_bal")
          )
      },
      Some(s"""
        SELECT n_name,
               count(DISTINCT s_suppkey)::BIGINT AS n_suppliers,
               count(*)::BIGINT AS n_lines,
               ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
               ${sqlAvg("s_acctbal")} AS avg_supp_bal
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
      """)
    ),
    // Z-order layout: 2-D Morton code over (customer, order-day) — the
    // multi-dim clustering key behind ZORDER BY table layout. Pure bit
    // arithmetic (shift-or-mask spread), whole-stage codegen, no UDF;
    // both engines compute the identical mask chain.
    GQuery(
      "zorder_layout",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        val x = col("o_custkey")
        val y = datediff(
          to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))
        )
        o.select(
            col("o_orderkey"),
            graft.operators.ZOrder.zvalue2(x, y).as("z")
          )
          .withColumn("zbucket", shiftright(col("z"), 16))
      },
      Some("""
        WITH base AS (SELECT o_orderkey,
                             o_custkey::BIGINT AS x,
                             (o_orderdate::DATE - DATE '1970-01-01')::BIGINT
                               AS y
                      FROM orders),
        s1 AS (SELECT o_orderkey,
                      ((x | (x << 16)) & 281470681808895) AS xa,
                      ((y | (y << 16)) & 281470681808895) AS ya
               FROM base),
        s2 AS (SELECT o_orderkey,
                      ((xa | (xa << 8)) & 71777214294589695) AS xb,
                      ((ya | (ya << 8)) & 71777214294589695) AS yb
               FROM s1),
        s3 AS (SELECT o_orderkey,
                      ((xb | (xb << 4)) & 1085102592571150095) AS xc,
                      ((yb | (yb << 4)) & 1085102592571150095) AS yc
               FROM s2),
        s4 AS (SELECT o_orderkey,
                      ((xc | (xc << 2)) & 3689348814741910323) AS xd,
                      ((yc | (yc << 2)) & 3689348814741910323) AS yd
               FROM s3),
        s5 AS (SELECT o_orderkey,
                      ((xd | (xd << 1)) & 6148914691236517205) AS xe,
                      ((yd | (yd << 1)) & 6148914691236517205) AS ye
               FROM s4)
        SELECT o_orderkey, (xe | (ye << 1)) AS z,
               ((xe | (ye << 1)) >> 16) AS zbucket
        FROM s5
      """)
    ),
    // D10 GROUPING SETS through the spark.sql surface (registered temp
    // view), complementing the DataFrame-API rollup/cube.
    GQuery(
      "q22_grouping_sets",
      (spark, dir) => {
        t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        spark.sql(s"""
          SELECT l_returnflag, l_linestatus,
                 CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
                 count(*) AS n,
                 CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
          FROM lineitem_v
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """)
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${sqlSum("l_quantity")} AS sum_qty,
               count(*)::BIGINT AS n,
               grouping(l_returnflag, l_linestatus)::BIGINT AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      """)
    ),
    // E3 window-function suite: ntile / percent_rank / cume_dist /
    // first_value / lead over a deterministic ordering.
    GQuery(
      "q20_window_suite",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        val w = Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        o.select(
          col("o_orderkey"),
          col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cd"),
          first(col("o_orderkey")).over(w).as("cheapest_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key")
        )
      },
      Some("""
        SELECT o_orderkey, o_orderpriority,
               ntile(4) OVER w::BIGINT AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cd,
               first_value(o_orderkey) OVER w AS cheapest_key,
               lead(o_orderkey, 1) OVER w AS next_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
      """)
    ),
    // D9 statistical aggregates, decimal-exact: stddev/variance derived
    // from exact sums so partial-aggregation order cannot perturb them.
    GQuery(
      "q21_stats",
      (spark, dir) => {
        val o = t(spark, dir, "orders")
        o.groupBy(col("o_orderpriority"))
          .agg(
            dsum(col("o_totalprice")).as("s"),
            dsum(col("o_totalprice") * col("o_totalprice")).as("sq"),
            count(lit(1)).as("n")
          )
          .select(
            col("o_orderpriority"),
            col("n"),
            round(col("s") / col("n"), 6).as("mean_price"),
            round(
              sqrt(
                (col("sq") - col("s") * col("s") / col("n"))
                  / (col("n") - 1)
              ),
              6
            ).as("stddev_price")
          )
      },
      Some(s"""
        WITH a AS (
          SELECT o_orderpriority,
                 ${sqlSum("o_totalprice")} AS s,
                 ${sqlSum("o_totalprice * o_totalprice")} AS sq,
                 count(*)::BIGINT AS n
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority, n,
               round(s / n, 6) AS mean_price,
               round(sqrt((sq - s * s / n) / (n - 1)), 6) AS stddev_price
        FROM a
      """)
    ),
    // Physical-layout co-location: both fact tables written bucketed +
    // sorted by the join key (catalog `bucketBy` + `saveAsTable`), then
    // joined bucket-to-bucket. The shuffle a plain orders⋈lineitem pays
    // on EVERY run is paid once at write time: the sort-merge join reads
    // matching buckets directly — PlanSpec asserts ZERO Exchange below
    // the join. This is the bucketing lever of the 100-TB design: at
    // cluster scale the bucketed write IS the table layout, and every
    // subsequent co-keyed join or aggregation on orderkey reads it
    // shuffle-free. (The oracle is the logical join on the raw tables —
    // layout must not change answers.)
    GQuery(
      "q27_bucketed_join",
      (spark, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val ob = s"graft_orders_b$tag"
        val lb = s"graft_lineitem_b$tag"
        graft.operators.Bucketing.saveBucketed(
          t(spark, dir, "orders").select("o_orderkey", "o_orderpriority"),
          ob, 8, "o_orderkey")
        graft.operators.Bucketing.saveBucketed(
          t(spark, dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount"),
          lb, 8, "l_orderkey")
        spark.table(lb)
          .hint("merge")
          .join(spark.table(ob), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("rev")
          )
          .select(
            col("o_orderpriority"),
            col("n_items"),
            round(col("rev"), 2).as("revenue")
          )
      },
      Some(s"""
        SELECT o_orderpriority, count(*)::BIGINT AS n_items,
               round(${sqlSum("l_extendedprice * (1 - l_discount)")}, 2)
                 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
      """)
    )
  )
}
