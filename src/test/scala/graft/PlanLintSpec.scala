package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tools.PlanLint

/** The lint must SEE the scale-killer shapes it exists for — including
  * the two blind spots the round-10 verdict called out: offenders
  * hidden behind an eager `localCheckpoint` (the final plan only shows
  * the materialized scan) and offenders inside subquery plans (the
  * rules used to walk children only).
  */
class PlanLintSpec extends SparkSpec {

  private def nodes = {
    import spark.implicits._
    spark.sparkContext.parallelize(1L to 50000L, 8).toDF("id")
  }

  test("a bare single-partition global rank window trips window1p") {
    val df = nodes.select(col("id"),
      row_number().over(Window.orderBy(col("id").desc)).as("rn"))
    val hits = PlanLint.offenders(df.queryExecution.executedPlan)
    assert(hits.exists(_._1 == "window1p"), s"expected window1p, got $hits")
  }

  test("the same window HIDDEN behind localCheckpoint is caught via action capture") {
    // the r10 q_graph_21/22 shape: rank-then-checkpoint — the final
    // plan sees only the checkpoint scan, so plain offenders() is
    // blind. `rn > 5` (not <=): a rank-<=k filter gets a partial
    // WindowGroupLimit below the exchange, which the lint correctly
    // treats as bounded — the unbounded residual is the offender.
    def build = {
      val hubs = nodes.select(col("id"),
          row_number().over(Window.orderBy(col("id").desc)).as("rn"))
        .filter(col("rn") > 5).localCheckpoint()
      hubs.groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"))
    }
    val blind = PlanLint.offenders(build.queryExecution.executedPlan)
    assert(!blind.exists(_._1 == "window1p"),
      "precondition: the final plan alone must NOT show the window " +
        s"(otherwise this test proves nothing): $blind")
    val hits = PlanLint.offendersWithActions(spark, build)
    assert(hits.exists { case (r, d) => r == "window1p" && d.contains("action") },
      s"capture must surface the checkpointed window: $hits")
  }

  test("the fixed hub-pick shape (exactGlobalRankBy + checkpoint) is clean") {
    def build = {
      val hubs = graft.api.Pipelines.exactGlobalRankBy(
          nodes, Seq(col("id").desc), "rn")
        .filter(col("rn") <= 5).localCheckpoint()
      hubs.groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"))
    }
    val hits = PlanLint.offendersWithActions(spark, build)
      .filter(_._1 == "window1p")
    assert(hits.isEmpty, s"range-partitioned rank must not trip window1p: $hits")
  }

  test("a single-partition window inside a scalar subquery is caught") {
    nodes.createOrReplaceTempView("lint_nodes")
    // NOTE a bare ORDER BY under an aggregate is useless and Catalyst's
    // EliminateSorts removes it, so the subquery offender here is the
    // indestructible form: a global rank window. `rn > 5` (not <=)
    // keeps WindowGroupLimit from bounding it.
    val df = spark.sql(
      """SELECT id FROM lint_nodes
        |WHERE id > (SELECT max(id) FROM (
        |  SELECT id, row_number() OVER (ORDER BY id DESC) AS rn
        |  FROM lint_nodes) WHERE rn > 5)""".stripMargin)
    val hits = PlanLint.offenders(df.queryExecution.executedPlan)
    assert(hits.exists(_._1 == "window1p"),
      s"subquery global window must be visible: $hits")
  }
}
