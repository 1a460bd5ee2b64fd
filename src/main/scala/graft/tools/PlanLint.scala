package graft.tools

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Plan lint (round 9, mechanizing the single-partition sweep the r7/r8
  * verdicts ran by hand so the class is RETIRED, not chased): walk every
  * declared query's physical plan and fail on a `WindowExec` fed by an
  * `Exchange SinglePartition` — the one-task global sort/window that
  * melts at fact scale — unless
  *
  *   (a) the exchange's input is already limit-bounded (a partial
  *       `WindowGroupLimitExec`, a limit, or a `TakeOrderedAndProject`
  *       sits below it, so the one partition sees ≤ k·P rows, never the
  *       corpus), or
  *   (b) the query id is waived in tools/plan_lint_waivers.txt with a
  *       justification citing the input's structural bound (calendar
  *       days/months/hours, a ≤k-row dim, a vocab cap, ...).
  *
  * The lint plans (does not execute) each query at the given fixture,
  * so it costs seconds; wired into tools/round_gate.sh step 2.
  *
  * Usage: `java -cp … graft.tools.PlanLint [sfDir] [waiversFile]`
  * Exit 1 on any unwaived hit, or on a stale waiver naming a query
  * that no longer trips the lint (waivers must not outlive their bug).
  */
object PlanLint {

  /** The first shuffle exchange feeding `p`, looking through the
    * sort/project/filter chain a window sits on.
    */
  private def feedingExchange(p: SparkPlan): Option[ShuffleExchangeExec] = p match {
    case e: ShuffleExchangeExec => Some(e)
    case s: SortExec => feedingExchange(s.child)
    case pr: ProjectExec => feedingExchange(pr.child)
    case f: FilterExec => feedingExchange(f.child)
    case w: WindowExec => feedingExchange(w.child)
    case w: WindowGroupLimitExec => feedingExchange(w.child)
    case _ => None
  }

  /** Is the subtree below the exchange already bounded to O(k·P) rows
    * by a group-limit / limit / top-k operator?
    */
  private def limitBoundedBelow(p: SparkPlan): Boolean =
    p.collectFirst {
      case _: WindowGroupLimitExec => ()
      case _: BaseLimitExec => ()
      case _: TakeOrderedAndProjectExec => ()
    }.isDefined

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** All offending window nodes in one query's plan, as one-line
    * descriptions (empty = clean).
    */
  def offenders(plan: SparkPlan): Seq[String] = {
    val root = unwrap(plan)
    root.collect {
      case w: WindowExec =>
        feedingExchange(w.child) match {
          case Some(e) if e.outputPartitioning == SinglePartition
              && !limitBoundedBelow(e.child) =>
            Some(s"Window[${w.windowExpression.map(_.sql).mkString(", ").take(120)}] over Exchange SinglePartition")
          case _ => None
        }
    }.flatten
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val waiversFile = args.lift(1).getOrElse("tools/plan_lint_waivers.txt")
    val waivers: Map[String, String] = {
      val f = new java.io.File(waiversFile)
      if (!f.exists()) Map.empty
      else scala.io.Source.fromFile(f, "UTF-8").getLines()
        .filterNot(l => l.trim.isEmpty || l.startsWith("#"))
        .map { l => val Array(n, why) = l.split("\t", 2); n -> why }
        .toMap
    }
    val spark = LocalSession()
    var unwaived = List.empty[(String, Seq[String])]
    var waivedHits = Set.empty[String]
    var planned = 0
    for (q <- graft.Registry.all) {
      val hits =
        try offenders(q.fn(spark, sfDir).queryExecution.executedPlan)
        catch { case e: Throwable =>
          Seq(s"PLANNING FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      planned += 1
      if (hits.nonEmpty) {
        if (waivers.contains(q.name)) waivedHits += q.name
        else unwaived ::= (q.name, hits)
      }
    }
    val stale = waivers.keySet -- waivedHits
    println(s"PLANLINT: $planned queries planned, ${unwaived.size} unwaived hit(s), " +
      s"${waivedHits.size} waived, ${stale.size} stale waiver(s)")
    for ((n, hs) <- unwaived.sortBy(_._1); h <- hs)
      println(s"  FAIL $n: $h")
    for (n <- stale.toSeq.sorted)
      println(s"  STALE WAIVER $n: no longer trips the lint — delete its line")
    spark.stop()
    if (unwaived.nonEmpty || stale.nonEmpty) sys.exit(1)
  }
}
