package graft

import org.apache.spark.sql.execution.{
  CollectLimitExec,
  GenerateExec,
  GlobalLimitExec,
  LocalLimitExec,
  LocalTableScanExec,
  SparkPlan,
  TakeOrderedAndProjectExec
}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** The two suite-wide plan sweeps (no cartesian product, no unpartitioned
  * window over an unlimited input) under AQE — the configuration
  * production actually runs. WindowSweepSpec disables AQE so the static
  * tree is traversable; this suite EXECUTES every query with AQE on and
  * walks the finalized `AdaptiveSparkPlanExec.executedPlan` (descending
  * through query stages and reused exchanges), so a pattern that only
  * materializes after runtime re-planning can't hide behind the static
  * sweep. AQE's broadcast demotions are deliberately NOT flagged here:
  * AQE broadcasts by MEASURED size at runtime, so a tiny-SF broadcast is
  * the correct adaptive decision and carries no 100-TB risk — the static
  * no-corpus-broadcast pins in PlanSpec (AQE off) remain that guard.
  */
class AqeSweepSpec extends SparkSpec {

  /** Children including what adaptive wrappers hide. */
  private def deepChildren(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec        => Seq(q.plan)
    case r: ReusedExchangeExec    => Seq(r.child)
    case _                        => p.children
  }

  private def walk(p: SparkPlan): Iterator[SparkPlan] =
    Iterator(p) ++ p.subqueries.iterator.flatMap(walk) ++
      deepChildren(p).iterator.flatMap(walk)

  /** Cardinality-bounding spine (the WindowSweepSpec rule) with adaptive
    * wrappers treated as pass-through. */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: TakeOrderedAndProjectExec | _: CollectLimitExec |
        _: GlobalLimitExec | _: LocalLimitExec => true
    case _: LocalTableScanExec    => true
    case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
    case q: QueryStageExec        => bounded(q.plan)
    case r: ReusedExchangeExec    => bounded(r.child)
    case _: GenerateExec          => false
    case _ if p.children.isEmpty  => false
    case _                        => p.children.forall(bounded)
  }

  private def violations(plan: SparkPlan): Seq[String] =
    walk(plan).flatMap {
      case c: CartesianProductExec =>
        Some(s"cartesian: ${c.simpleString(120)}")
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        Some(s"unbounded global window: ${w.simpleString(120)}")
      case _ => None
    }.toSeq

  test("AQE-on: no cartesian products or unbounded global windows in any executed plan") {
    GraftExtensions.register(spark) // knn_sql resolves graft_topk et al.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      val found =
        try {
          val qe = f(spark, sf0001).queryExecution
          qe.toRdd.count() // finalize every adaptive stage
          violations(qe.executedPlan)
        } catch { case e: Throwable => Seq(s"execution failed: $e") }
      found.map(v => s"$name: $v")
    }
    assert(bad.isEmpty, s"AQE-on plan violations:\n${bad.mkString("\n")}")
  }

  test("detector: seeded violations are visible through the adaptive wrapper") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id".as("x"))
    val badWin = df.withColumn("r", row_number().over(Window.orderBy($"x")))
    val qe1 = badWin.queryExecution
    qe1.toRdd.count()
    assert(violations(qe1.executedPlan).exists(_.contains("unbounded")),
      "seeded unpartitioned window not detected under AQE")
    // the non-equi inner join only plans CartesianProduct when neither
    // side is broadcastable — disable both broadcast thresholds (static
    // and adaptive) so AQE can't demote the seed to a nested-loop join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val badCart = df.as("a")
        .join(df.as("b"), expr("a.x + b.x > -1000000"), "inner")
        .limit(5)
      val qe2 = badCart.queryExecution
      qe2.toRdd.count()
      assert(violations(qe2.executedPlan).exists(_.contains("cartesian")),
        "seeded cartesian not detected under AQE")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
