package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{
  CollectLimitExec,
  GlobalLimitExec,
  LocalLimitExec,
  SparkPlan,
  TakeOrderedAndProjectExec
}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Suite-wide guard against the single-partition-window class: a
  * `WindowExec` with an EMPTY partition spec serializes its whole input
  * onto one task, so it is only admissible when the input is provably
  * bounded — a `limit`/TakeOrdered sits below it, or the subtree's
  * cardinality is a constant of the query (not of the data).
  *
  * The one instance that slipped through review (TextRank's vocab-sized
  * rank window, fixed to the TakeOrdered-first BM25 shape) showed the
  * pattern wasn't mechanically banned the way NLJ/cartesian/exchange
  * shapes are in PlanSpec. This sweep walks EVERY `SparkEntry.queries`
  * physical plan and fails on any unpartitioned window whose subtree has
  * no limit node, unless the query is on the documented bounded-input
  * allowlist. New queries that regress into the pattern fail the build.
  */
class WindowSweepSpec extends SparkSpec {

  /** Empty-partition windows whose input is bounded by construction, not
    * by a physical limit node. Each entry documents WHY the input is a
    * constant-size table; growing this list must be a conscious act.
    */
  private val boundedByConstruction: Map[String, String] = Map.empty

  /** Names of unpartitioned-window nodes with no limit below, in `plan`
    * or any of its subqueries. */
  private def violations(plan: SparkPlan): Seq[String] = {
    // Cardinality-bounding spine walk (r13 advice): a limit node anywhere
    // in the subtree is NOT enough — a limit on one branch of a join must
    // not sanction a window whose other branch is unbounded. A subtree is
    // bounded iff it IS a limit node, or it is a non-row-expanding
    // operator ALL of whose children are bounded (unary ops pass through;
    // joins/unions require every branch bounded: bounded × bounded stays
    // bounded). Generate (explode) expands rows data-dependently → never
    // bounded; leaves (scans) are never bounded.
    def bounded(p: SparkPlan): Boolean = p match {
      case _: TakeOrderedAndProjectExec | _: CollectLimitExec |
          _: GlobalLimitExec | _: LocalLimitExec => true
      // a LocalTableScan's rows are embedded in the plan itself — a query
      // constant, not data-dependent (the optimizer folds literal local
      // relations and their limits into this leaf)
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _: org.apache.spark.sql.execution.GenerateExec       => false
      case _ if p.children.isEmpty                              => false
      case _ => p.children.forall(bounded)
    }
    def sweep(p: SparkPlan): Seq[String] = {
      val here = p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
          w.simpleString(120)
      }
      here ++ p.collect { case q => q }.flatMap(_.subqueries).flatMap(sweep)
    }
    sweep(plan)
  }

  private def check(df: DataFrame): Seq[String] =
    violations(df.queryExecution.executedPlan)

  test("detector flags a seeded unpartitioned window over an unlimited input") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import spark.implicits._
      // seeded over a REAL parquet scan: literal local relations fold to
      // LocalTableScan, which the spine walk correctly treats as a plan
      // constant — a toy Seq.toDF can't exercise the unbounded case
      val df = spark.read.parquet(s"$sf0001/documents.parquet")
        .select($"doc_id".as("x"))
      val bad = df.withColumn("r", row_number().over(Window.orderBy($"x")))
      assert(check(bad).nonEmpty, "seeded violation not detected")
      val ok = df
        .orderBy($"x")
        .limit(2)
        .withColumn("r", row_number().over(Window.orderBy($"x")))
      assert(check(ok).isEmpty, "limited input falsely flagged")
      // the r13 false-negative class: a limit on ONE join branch must not
      // sanction a window whose joined input is still unbounded
      val joined = df.limit(2).crossJoin(df.select($"x".as("y")))
        .withColumn("r", row_number().over(Window.orderBy($"y")))
      assert(check(joined).nonEmpty,
        "limit on one join branch falsely sanctioned an unbounded window")
      // but a join of two bounded branches IS bounded (k1 × k2 constant)
      val bothBounded = df.limit(2)
        .crossJoin(df.select($"x".as("y")).limit(2))
        .withColumn("r", row_number().over(Window.orderBy($"y")))
      assert(check(bothBounded).isEmpty,
        "join of two limited branches falsely flagged")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Queries whose plan legitimately contains a CartesianProductExec:
    * each entry documents WHY the product is bounded (an audit-scale
    * contract or a constant-size side). Growing this list must be a
    * conscious act.
    */
  private val cartesianAllowed: Map[String, String] = Map.empty

  test("no query plans a CartesianProduct join (all-pairs must stay blocked)") {
    // the all-pairs analog of the window sweep: PlanSpec pins
    // no-cartesian on representative plans; this closes the CLASS.
    // BroadcastNestedLoopJoin is NOT flagged — the engine uses it
    // deliberately for 1-row stats crossJoins and broadcast-query kNN,
    // where the broadcast side is bounded by contract.
    GraftExtensions.register(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, f) =>
          if (cartesianAllowed.contains(name)) Nil
          else {
            val found =
              try {
                val plan = f(spark, sf0001).queryExecution.executedPlan
                def sweep(p: SparkPlan): Seq[String] = {
                  val here = p.collect {
                    case c: org.apache.spark.sql.execution.joins.CartesianProductExec =>
                      c.simpleString(120)
                  }
                  here ++ p.collect { case q => q }
                    .flatMap(_.subqueries).flatMap(sweep)
                }
                sweep(plan)
              } catch { case e: Throwable => Seq(s"planning failed: $e") }
            found.map(v => s"$name: $v")
          }
      }
      assert(bad.isEmpty,
        s"cartesian products planned:\n${bad.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("no query plans an unpartitioned window over an unlimited input") {
    // AQE off so the physical tree is directly traversable (no
    // AdaptiveSparkPlanExec wrapper hiding the real operators)
    GraftExtensions.register(spark) // knn_sql resolves graft_topk et al.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, f) =>
          if (boundedByConstruction.contains(name)) Nil
          else {
            val vs =
              try check(f(spark, sf0001))
              catch { case e: Throwable => Seq(s"planning failed: $e") }
            vs.map(v => s"$name: $v")
          }
      }
      assert(
        bad.isEmpty,
        s"unpartitioned windows over unlimited inputs:\n${bad.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
