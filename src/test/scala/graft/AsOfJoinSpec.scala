package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Correctness + skew-safety of the sort-merge as-of join. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of sweep == join+rank spelling on sf0.001 events") {
    val e = graft.queries.Q.events(spark, sf0001)
    def side(tpe: String) = e.filter(col("event_type") === tpe)
      .select(col("event_id").as("id"), col("user_id").as("k"),
        unix_micros(col("ts")).as("ts"))
    val sweep = AsOfJoin.lastAtOrBefore(side("purchase"), side("signup"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val p = side("purchase").withColumnRenamed("id", "p_id")
      .withColumnRenamed("k", "p_k").withColumnRenamed("ts", "p_ts")
    val s = side("signup").withColumnRenamed("id", "s_id")
      .withColumnRenamed("k", "s_k").withColumnRenamed("ts", "s_ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_id")).orderBy(col("s_ts").desc, col("s_id"))
    val naive = p.join(s, col("p_k") === col("s_k") && col("s_ts") <= col("p_ts"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("p_id"), col("p_k"), col("s_id"), (col("p_ts") - col("s_ts")).as("lag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sweep == naive, s"sweep ${sweep.size} vs naive ${naive.size}")
    assert(sweep.nonEmpty)
  }

  test("tie rules: same-instant right row matches; equal ts keeps min id") {
    val left = Seq((100L, 1L, 50L)).toDF("id", "k", "ts")
    val right = Seq(
      (7L, 1L, 50L), (3L, 1L, 50L), // same instant as the left row: min id wins
      (1L, 1L, 40L)
    ).toDF("id", "k", "ts")
    val r = AsOfJoin.lastAtOrBefore(left, right).collect()
    assert(r.length == 1)
    assert(r.head.getLong(2) == 3L && r.head.getLong(3) == 0L, r.head)
  }

  test("left rows before any right row are dropped; keys don't leak") {
    val left = Seq((1L, 1L, 10L), (2L, 2L, 99L)).toDF("id", "k", "ts")
    val right = Seq((5L, 1L, 20L)).toDF("id", "k", "ts") // key 2 has no right
    val r = AsOfJoin.lastAtOrBefore(left, right).collect()
    assert(r.isEmpty, r.mkString(","))
  }

  test("power user: 10^4 x 10^4 one-key as-of finishes without pair explosion") {
    val n = 10000
    // signups at even micros (ids 0..n-1), purchases at odd micros
    // (ids 100000..): purchase at 2i+1 matches the signup at 2i
    val signups = spark.range(n)
      .select(col("id"), lit(7L).as("k"), (col("id") * 2).as("ts"))
    val purchases = spark.range(n)
      .select((col("id") + 100000).as("id"), lit(7L).as("k"),
        (col("id") * 2 + 1).as("ts"))
    val t0 = System.nanoTime()
    val r = AsOfJoin.lastAtOrBefore(purchases, signups)
    assert(r.count() == n)
    val secs = (System.nanoTime() - t0) / 1e9
    // the join+rank spelling materializes 10^8 pairs here; the sweep
    // touches 2n rows and must stay interactive
    assert(secs < 60.0, s"as-of sweep took ${secs}s")
    val wrong = r.filter(col("lag") =!= 1L).count()
    assert(wrong == 0, s"$wrong rows with wrong lag")
  }
}
