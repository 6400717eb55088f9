package graft

import org.apache.spark.sql.functions._

import graft.functions.TopFreqAgg.topFreq

/** Misra-Gries heavy-hitters aggregate: exact regime, lossy regime with
  * the self-validating bound, distributed-merge invariance, and the SQL
  * registration.
  */
class TopFreqSpec extends SparkSpec {
  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(topFreq(col("tok"), cap).as("s"))
      .select(col("s.dec").as("dec"), explode(col("s.items")).as("it"))
      .select(col("dec"), col("it.tok").as("tok"), col("it.est").as("est"))

  test("capacity >= distinct count: summary is exact with dec = 0") {
    val toks = (0 until 1000).map(i => s"t${i % 7}").toDF("tok")
    val got = summary(toks.repartition(8), 16).collect()
    assert(got.forall(_.getLong(0) == 0L))
    val m = got.map(r => r.getString(1) -> r.getLong(2)).toMap
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == exact)
  }

  test("lossy regime on skewed data: heavy item kept, bounds hold") {
    // zipf-ish: one dominant item, a tail of rare ones
    val rows =
      Seq.fill(5000)("heavy") ++ Seq.fill(800)("warm") ++
        (0 until 2000).map(i => s"rare$i")
    val toks = scala.util.Random.shuffle(rows).toDF("tok").repartition(16)
    val exact = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = summary(toks, 8).collect()
    val dec = got.head.getLong(0)
    // any item with true count > dec is guaranteed present — and dec is
    // bounded by N/(capacity+1) along every merge tree
    assert(dec < 7800L / 9 + 1)
    val m = got.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(m.contains("heavy"))
    // self-validating bound for every reported item: est <= true <= est+dec
    m.foreach { case (t, est) =>
      val truth = exact(t)
      assert(est <= truth && truth <= est + dec, s"$t est=$est true=$truth dec=$dec")
    }
  }

  test("merge invariance: 1 partition and 32 partitions agree in the exact regime") {
    val toks = (0 until 5000).map(i => s"w${i % 11}").toDF("tok")
    val one = summary(toks.coalesce(1), 32).collect().map(r => (r.getString(1), r.getLong(2))).sorted
    val many = summary(toks.repartition(32), 32).collect().map(r => (r.getString(1), r.getLong(2))).sorted
    assert(one.sameElements(many))
  }

  test("graft_topfreq is registered for pure spark.sql users") {
    GraftExtensions.register(spark)
    (0 until 100).map(i => s"x${i % 3}").toDF("tok").createOrReplaceTempView("tf_sql")
    val r = spark.sql(
      "SELECT s.dec AS dec, size(s.items) AS n FROM " +
        "(SELECT graft_topfreq(tok, 8) AS s FROM tf_sql)"
    ).collect().head
    assert(r.getLong(0) == 0L && r.getInt(1) == 3)
  }

  test("capacity must be a positive literal") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_topfreq(tok, 0) FROM VALUES ('a') AS t(tok)").collect()
    }
    assert(e.getMessage.contains("graft_topfreq"), e.getMessage)
    assert(e.getMessage.contains("capacity"), e.getMessage)
  }

  test("relational CMS in the lossy regime: mass conserved, error one-sided, collisions real") {
    // the text_cms algebra at a vocabulary (4000 tokens) >> width (64
    // buckets), so bucket collisions genuinely overcount — the regime the
    // oracle's tiny-vocab corpus can't exercise
    val d = 4
    val wW = 64
    val js = expr(s"array(${(0 until d).mkString(",")})")
    def bucket(j: org.apache.spark.sql.Column, tok: org.apache.spark.sql.Column) =
      pmod(graft.operators.Dedup.md5Long(concat(j.cast("string"), lit(":"), tok)), lit(wW))
    // zipf-ish: token t_i appears ~ 4000/(i+1) times, 4000 distinct
    val toks = (0 until 4000)
      .flatMap(i => Seq.fill(math.max(1, 4000 / (i + 1) / 40))(s"t$i"))
      .toDF("tok")
    val n = toks.count()
    val sketch = toks
      .select(explode(js).as("j"), col("tok"))
      .select(col("j"), bucket(col("j"), col("tok")).as("b"))
      .groupBy(col("j"), col("b"))
      .agg(count(lit(1)).as("c"))
    // every sketch row conserves the full token mass
    val rowMass = sketch.groupBy(col("j")).agg(sum(col("c")).as("m"))
      .collect().map(r => r.getLong(1))
    assert(rowMass.length == d && rowMass.forall(_ == n), rowMass.toSeq)
    // estimate EVERY token; the error must be one-sided (est >= exact)
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
    val est = exact
      .select(col("tok"), col("exact_n"), explode(js).as("j"))
      .select(col("tok"), col("exact_n"), col("j"),
        bucket(col("j"), col("tok")).as("b"))
      .join(sketch, Seq("j", "b"))
      .groupBy(col("tok"), col("exact_n"))
      .agg(min(col("c")).as("est_n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.length == 4000)
    assert(est.forall { case (_, ex, e) => e >= ex },
      est.filter { case (_, ex, e) => e < ex }.take(5).toSeq)
    // at vocab/width = 62 the sketch must actually collide somewhere
    assert(est.exists { case (_, ex, e) => e > ex }, "no collision at 4000/64")
  }
}
