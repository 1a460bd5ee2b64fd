package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan contracts for the round-7 waves: the shapes that decide
  * 100 TB behavior (broadcast vs shuffle, anti/semi joins planned as
  * single hash joins, map-side partial aggregation — including for the
  * custom typed Aggregator) are pinned as failing tests, not left to
  * .explain inspection.
  */
class PlanContract7Spec extends SparkSpec {

  private def planOf(name: String) = {
    val qe = Registry.byName(name).fn(spark, sf).queryExecution
    qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def planString(name: String): String = planOf(name).toString

  test("q_tpch_1_pricing: shipdate filter is pushed and the agg is two-phase") {
    val root = planOf("q_tpch_1_pricing")
    val scan = root.collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PushedFilters").contains("l_shipdate"),
      s"shipdate must reach the scan: ${scan.metadata("PushedFilters")}")
    assert(scan.requiredSchema.fields.length <= 7,
      s"Q1 scan must be pruned, reads: ${scan.requiredSchema.fieldNames.mkString(",")}")
    val p = root.toString
    assert(p.contains("partial_"),
      "Q1 must partial-aggregate map-side (6 groups x partials, not a raw shuffle)")
    assert(!p.contains("SortMergeJoin"), "Q1 has no join; none may appear")
  }

  test("q_filter_7_dynamic_in: the IN-subquery becomes a broadcast semi join") {
    val p = planString("q_filter_7_dynamic_in")
    assert(p.contains("LeftSemi"), s"expected a semi join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "the 5-row IN-list must broadcast, not shuffle the customer table")
  }

  test("q_join_27_anti_range: one anti hash join carries the range residual") {
    val p = planString("q_join_27_anti_range")
    assert(p.contains("LeftAnti"), s"expected an anti join:\n$p")
    assert(p.contains("datediff") || p.contains("date_diff"),
      "the range residual must live inside the join, not a re-executed subquery")
  }

  test("q_sub_7_not_exists: EXISTS and NOT EXISTS plan as semi + anti, no re-execution") {
    val p = planString("q_sub_7_not_exists")
    assert(p.contains("LeftSemi"), "EXISTS must be a left_semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must be a left_anti join")
  }

  test("q_udaf_4_bottomk: the typed Aggregator partial-aggregates map-side") {
    val p = planString("q_udaf_4_bottomk")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed Aggregator must plan as an aggregate:\n$p")
    assert(p.contains("partial"),
      "the K-bounded buffer must combine map-side (partial aggregation), " +
        "otherwise every raw row ships to the reducer")
  }

  test("q_sort_6/7: top-100 rank over the dim keeps scans pruned") {
    for (name <- Seq("q_sort_6_nulls_order", "q_sort_7_mixed_dirs")) {
      val root = planOf(name)
      val scans = root.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      for (sc <- scans)
        assert(sc.requiredSchema.fields.length <= 4,
          s"$name reads ${sc.requiredSchema.fieldNames.mkString(",")} — pruning regressed")
    }
  }

  test("q_mm_11_magic_sniff: sniff is a builtin CASE projection over one pruned scan") {
    val root = planOf("q_mm_11_magic_sniff")
    val scans = root.collect { case s: FileSourceScanExec => s }
    assert(scans.length == 1, "one documents scan only")
    assert(scans.head.requiredSchema.fieldNames.toSet ==
      Set("doc_id", "text", "n_chars"),
      s"sniff scan must be pruned: ${scans.head.requiredSchema.fieldNames.mkString(",")}")
    val p = root.toString
    assert(p.contains("CASE WHEN") && p.contains("hex(substring"),
      "the sniff must be a builtin CASE/hex projection (codegen-eligible)")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "no UDF may appear on the sniff path")
    assert(p.contains("partial_"), "the 3-group agg must combine map-side")
  }
}
