package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** Query surface over the `events` table: JSON extraction, time windows,
  * running/lag analytics, sessionization, as-of join (SURVEY.md §2 C8, D11,
  * E3, F9, and the batch halves of §2.G).
  *
  * Running/windowed double sums go through decimals (see [[Q.dsum]]) so the
  * result is independent of the engine's window-aggregation algorithm
  * (DuckDB uses segment trees — a different addition order than Spark's
  * running accumulator).
  */
object EventQueries {

  private val evOrder = Seq(col("ts"), col("event_id"))

  val all: Seq[GQuery] = Seq(
    // Cohort retention triangle — the canonical product-analytics OLAP
    // shape: users cohorted by first-active ISO week, retention =
    // fraction of the cohort active again k weeks later. Three hash
    // aggregations and one join, all keyed on (user | week) — at scale
    // the distinct (user, week) activity set is the only large
    // intermediate and it shuffles once.
    GQuery(
      "q31_cohort_retention",
      (spark, dir) => {
        val act = events(spark, dir)
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
          .distinct()
        val first = act.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
        val sizes = first.groupBy(col("cw"))
          .agg(count(lit(1)).as("n_cohort"))
        act
          .join(first, "user_id")
          .withColumn(
            "week_offset",
            (datediff(col("w"), col("cw")) / 7).cast("long"))
          .groupBy(col("cw"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(sizes, "cw")
          .select(
            date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"),
            col("n_active"),
            col("n_cohort"),
            round(col("n_active").cast("double") / col("n_cohort"), 6)
              .as("retention"))
      },
      Some("""
        WITH act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
                     FROM events),
        f AS (SELECT user_id, min(w) AS cw FROM act GROUP BY 1),
        sizes AS (SELECT cw, count(*)::BIGINT AS n_cohort FROM f GROUP BY 1),
        g AS (SELECT f.cw, (date_diff('day', f.cw, a.w) // 7)::BIGINT
                       AS week_offset,
                     count(DISTINCT a.user_id)::BIGINT AS n_active
              FROM act a JOIN f USING (user_id) GROUP BY 1, 2)
        SELECT strftime(g.cw, '%Y-%m-%d') AS cohort_week,
               week_offset, n_active, n_cohort,
               round(n_active::DOUBLE / n_cohort, 6) AS retention
        FROM g JOIN sizes ON sizes.cw = g.cw
      """)
    ),
    // Banded INTERVAL join via bucket blocking — the missing join class
    // next to equi (q2), as-of (q17), and range-predicate (knn): each
    // purchase is matched to OTHER users' clicks within ±1 hour. The
    // naive spelling is an inequality join (O(n·m) nested loop at any
    // scale); the scale-honest plan bins both sides to hour buckets,
    // replicates the purchase side to its 3 covering buckets (a click
    // lives in exactly ONE bucket, so each qualifying pair meets exactly
    // once — no distinct needed), equi-joins on the bucket, and applies
    // the exact |Δt| predicate to bucket-mates only. Time in integer
    // MICROSECONDS on both engines (unix_micros / epoch_us) — no
    // float-epoch rounding divergence.
    GQuery(
      "q32_interval_join",
      (spark, dir) => {
        val hourUs = 3600L * 1000000L
        val ev = events(spark, dir)
        val p = ev
          .filter(col("event_type") === "purchase")
          .select(
            col("event_id").as("p_id"), col("user_id").as("p_user"),
            unix_micros(col("ts")).as("p_us"))
          .withColumn("b0", expr(s"p_us div ${hourUs}L"))
          .select(
            col("p_id"), col("p_user"), col("p_us"),
            explode(array(
              col("b0") - 1, col("b0"), col("b0") + 1)).as("bucket"))
        val c = ev
          .filter(col("event_type") === "click")
          .select(
            col("user_id").as("c_user"),
            unix_micros(col("ts")).as("c_us"))
          .withColumn("bucket", expr(s"c_us div ${hourUs}L"))
        val matched = p
          .join(c, Seq("bucket"))
          .filter(
            col("c_user") =!= col("p_user") &&
              abs(col("p_us") - col("c_us")) <= hourUs)
          .groupBy(col("p_id"))
          .agg(count(lit(1)).as("n_nearby_clicks"))
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"))
          .join(matched, Seq("p_id"), "left")
          .select(
            col("p_id"),
            coalesce(col("n_nearby_clicks"), lit(0L)).as("n_nearby_clicks"))
      },
      Some("""
        WITH p AS (SELECT event_id AS p_id, user_id AS p_user,
                          epoch_us(ts) AS p_us
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, epoch_us(ts) AS c_us
              FROM events WHERE event_type = 'click'),
        m AS (SELECT p.p_id, count(*)::BIGINT AS n_nearby_clicks
              FROM p JOIN c
                ON c.c_user != p.p_user
               AND abs(p.p_us - c.c_us) <= 3600000000
              GROUP BY 1)
        SELECT p.p_id, coalesce(m.n_nearby_clicks, 0)::BIGINT
                 AS n_nearby_clicks
        FROM p LEFT JOIN m ON m.p_id = p.p_id
      """)
    ),
    // F9: JSON extraction from props + grouped agg.
    GQuery(
      "q12_json_extract",
      (spark, dir) => {
        val e = events(spark, dir)
        e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"),
            min(col("k")).as("min_k")
          )
      },
      Some("""
        SELECT event_type, count(*)::BIGINT AS n,
               sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
               max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k,
               min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k
        FROM events GROUP BY event_type
      """)
    ),
    // §2.G batch half: tumbling 1-hour windows per event_type — the same
    // window() operator Structured Streaming uses, checked against the
    // oracle via date_trunc equivalence.
    GQuery(
      "q13_hourly_windows",
      (spark, dir) => {
        val e = events(spark, dir)
        e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(
            unix_micros(col("window.start")).as("ws"),
            col("event_type"), col("n"), col("sum_value")
          )
      },
      Some(s"""
        SELECT epoch_us(date_trunc('hour', ts)) AS ws, event_type,
               count(*)::BIGINT AS n, ${sqlSum("value")} AS sum_value
        FROM events GROUP BY 1, 2
      """)
    ),
    // E3 frames: per-user running event count + running value sum, ordered
    // by (ts, event_id).
    GQuery(
      "q14_running_per_user",
      (spark, dir) => {
        val e = events(spark, dir)
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(evOrder: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.select(
          col("event_id"),
          col("user_id"),
          count(lit(1)).over(w).as("running_n"),
          sum(col("value").cast(DecimalType(30, 6)))
            .over(w).cast("double").as("running_value")
        )
      },
      Some("""
        SELECT event_id, user_id,
               count(*) OVER w::BIGINT AS running_n,
               sum(value::DECIMAL(30,6)) OVER w::DOUBLE AS running_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      """)
    ),
    // E3 lag: inter-event gap per user in seconds.
    GQuery(
      "q15_event_gaps",
      (spark, dir) => {
        val e = events(spark, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
        e.select(
            col("event_id"),
            col("user_id"),
            (unix_micros(col("ts"))
              - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us")
          )
          .filter(col("gap_us").isNotNull)
      },
      Some("""
        SELECT event_id, user_id, gap_us FROM (
          SELECT event_id, user_id,
                 epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id
                                                          ORDER BY ts, event_id)) AS gap_us
          FROM events)
        WHERE gap_us IS NOT NULL
      """)
    ),
    // Sessionization (batch form of session_window): a session breaks after
    // a 30-minute silence; classic lag -> new-session flag -> running sum.
    GQuery(
      "q16_sessions",
      (spark, dir) => {
        val e = events(spark, dir)
        val wo = Window.partitionBy(col("user_id")).orderBy(evOrder: _*)
        val flagged = e.withColumn(
          "new_sess",
          when(
            unix_micros(col("ts"))
              - unix_micros(lag(col("ts"), 1).over(wo)) > 1800000000L,
            1L
          ).otherwise(
            when(lag(col("ts"), 1).over(wo).isNull, 1L).otherwise(0L)
          )
        )
        val sess = flagged.withColumn(
          "session_id",
          sum(col("new_sess"))
            .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
        sess
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            dsum(col("value")).as("session_value")
          )
      },
      Some(s"""
        WITH flagged AS (
          SELECT user_id, value,
                 CASE WHEN lag(ts, 1) OVER w IS NULL THEN 1
                      WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000 THEN 1
                      ELSE 0 END::BIGINT AS new_sess,
                 ts, event_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)::BIGINT AS session_id
          FROM flagged)
        SELECT user_id, session_id, count(*)::BIGINT AS n_events,
               ${sqlSum("value")} AS session_value
        FROM sess GROUP BY user_id, session_id
      """)
    ),
    // Skew pattern: two-stage salted aggregation — partial agg on
    // (key, salt) spreads a hot key over 8 reducers, final agg merges the
    // partials. Result is identical to the direct groupBy (the oracle runs
    // the plain form); the exact-decimal sums make the two-stage merge
    // lossless.
    GQuery(
      "q19_salted_agg",
      (spark, dir) => {
        val e = events(spark, dir)
        val partial = e
          .withColumn("salt", pmod(col("event_id"), lit(8)))
          .groupBy(col("event_type"), col("salt"))
          .agg(
            sum(col("value").cast(DecimalType(30, 6))).as("psum"),
            count(lit(1)).as("pn")
          )
        partial
          .groupBy(col("event_type"))
          .agg(
            sum(col("psum")).cast("double").as("sum_value"),
            sum(col("pn")).as("n")
          )
      },
      Some(s"""
        SELECT event_type, ${sqlSum("value")} AS sum_value,
               count(*)::BIGINT AS n
        FROM events GROUP BY event_type
      """)
    ),
    // C8 as-of join: for each purchase, the nearest preceding signup of the
    // same user. One hash shuffle on user + a sorted streaming sweep
    // ([[graft.operators.AsOfJoin]]) — a hot user costs |S|+|P| rows, not
    // the |S|·|P| pair explosion of the join+rank spelling.
    GQuery(
      "q17_asof_purchase_signup",
      (spark, dir) => {
        val e = events(spark, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(
            col("event_id").as("id"), col("user_id").as("k"),
            unix_micros(col("ts")).as("ts")
          )
        val signups = e.filter(col("event_type") === "signup")
          .select(
            col("event_id").as("id"), col("user_id").as("k"),
            unix_micros(col("ts")).as("ts")
          )
        graft.operators.AsOfJoin
          .lastAtOrBefore(purchases, signups)
          .select(
            col("left_id").as("p_id"), col("k").as("p_user"),
            col("right_id").as("s_id"), col("lag").as("lag_us")
          )
      },
      Some("""
        SELECT p_id, p_user, s_id, lag_us FROM (
          SELECT p.event_id AS p_id, p.user_id AS p_user, s.event_id AS s_id,
                 epoch_us(p.ts) - epoch_us(s.ts) AS lag_us,
                 row_number() OVER (PARTITION BY p.event_id
                                    ORDER BY s.ts DESC, s.event_id) AS rnk
          FROM events p JOIN events s
            ON p.user_id = s.user_id AND s.ts <= p.ts
          WHERE p.event_type = 'purchase' AND s.event_type = 'signup')
        WHERE rnk = 1
      """)
    ),
    // Ordered conversion funnel signup → view → click → purchase: a user
    // reaches stage i+1 only with an event STRICTLY AFTER their stage-i
    // time (min-ts chain — the standard funnel semantics). Every join and
    // aggregation in the chain keys on the SAME user_id. At bench scale
    // AQE broadcasts the shrinking stage-i user set against the next
    // filtered scan (observed plan: broadcast hash joins, no corpus-side
    // extra shuffles); at 100 TB the identical logical chain degrades
    // gracefully to co-partitioned shuffle joins on that one key — the
    // stage side only ever shrinks, so whichever side AQE picks is the
    // small one.
    GQuery(
      "q28_funnel",
      (spark, dir) => {
        val e = events(spark, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val s2 = e.filter(col("event_type") === "view")
          .join(s1, "user_id").filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val s3 = e.filter(col("event_type") === "click")
          .join(s2, "user_id").filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val s4 = e.filter(col("event_type") === "purchase")
          .join(s3, "user_id").filter(col("ts") > col("t3"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t4"))
        def stage(df: org.apache.spark.sql.DataFrame, i: Int, name: String) =
          df.agg(count(lit(1)).as("n_users"))
            .select(
              lit(i.toLong).as("stage"),
              lit(name).as("stage_name"),
              col("n_users")
            )
        stage(s1, 1, "signup")
          .unionAll(stage(s2, 2, "view"))
          .unionAll(stage(s3, 3, "click"))
          .unionAll(stage(s4, 4, "purchase"))
      },
      Some("""
        WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e
               JOIN s1 USING (user_id)
               WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e
               JOIN s2 USING (user_id)
               WHERE event_type = 'click' AND ts > t2 GROUP BY 1),
        s4 AS (SELECT e.user_id, min(ts) AS t4 FROM events e
               JOIN s3 USING (user_id)
               WHERE event_type = 'purchase' AND ts > t3 GROUP BY 1)
        SELECT 1::BIGINT AS stage, 'signup' AS stage_name,
               count(*)::BIGINT AS n_users FROM s1
        UNION ALL SELECT 2, 'view', count(*) FROM s2
        UNION ALL SELECT 3, 'click', count(*) FROM s3
        UNION ALL SELECT 4, 'purchase', count(*) FROM s4
      """)
    ),
    // Pivot (long → wide): daily event counts, one column per event
    // type. The value list is EXPLICIT, so Spark skips the
    // distinct-values discovery job and the output schema is static —
    // the only plan is one hash agg on (month); each pivot cell is a
    // map-side conditional count. The oracle is the same query in its
    // relational normal form (FILTER'd counts).
    GQuery(
      "q29_pivot",
      (spark, dir) => {
        val e = events(spark, dir)
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        e.groupBy(col("day"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
      },
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(*) FILTER (event_type = 'click')::BIGINT AS click,
               count(*) FILTER (event_type = 'error')::BIGINT AS error,
               count(*) FILTER (event_type = 'purchase')::BIGINT AS purchase,
               count(*) FILTER (event_type = 'signup')::BIGINT AS signup,
               count(*) FILTER (event_type = 'view')::BIGINT AS view
        FROM events
        GROUP BY 1
      """)
    ),
    // SLIDING windows (1 h length, 15 min slide) — the overlap variant
    // q13's tumbling windows don't exercise: every event lands in exactly
    // 4 windows. Spark's window() replicates rows map-side (a Generate of
    // 4, no shuffle amplification beyond the agg); the oracle spells the
    // same epoch-aligned arithmetic with an explicit 0..3 offset cross.
    GQuery(
      "q30_sliding",
      (spark, dir) => {
        val e = events(spark, dir)
        e.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(
            unix_micros(col("window.start")).as("ws"),
            col("event_type"), col("n"), col("sum_value")
          )
      },
      Some(s"""
        WITH b AS (SELECT event_type, value, epoch_us(ts) AS tu FROM events),
        w AS (SELECT event_type, value,
                     (tu // 900000000) * 900000000
                       - k.k * 900000000 AS ws
              FROM b CROSS JOIN
                   (SELECT unnest(generate_series(0, 3)) AS k) k)
        SELECT ws, event_type, count(*)::BIGINT AS n,
               ${sqlSum("value")} AS sum_value
        FROM w GROUP BY 1, 2
      """)
    )
  )
}
