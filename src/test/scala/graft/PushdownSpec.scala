package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-efficiency contracts: predicates reach the parquet reader
  * (PushedFilters) and projections shrink the read schema — at 100 TB
  * these decide whether a query reads terabytes or gigabytes, so they
  * are pinned as plan tests, not left to inspection.
  */
class PushdownSpec extends SparkSpec {

  private def scans(name: String): Seq[FileSourceScanExec] = {
    val plan = Registry.byName(name).fn(spark, sf).queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collect { case s: FileSourceScanExec => s }
  }

  test("q_filter_1_range: range predicates are pushed to the parquet scan") {
    val s = scans("q_filter_1_range")
    assert(s.nonEmpty, "expected a FileSourceScanExec")
    val pushed = s.head.metadata("PushedFilters")
    for (c <- Seq("l_shipdate", "l_quantity")) {
      assert(pushed.contains(c), s"$c must appear in PushedFilters, got: $pushed")
    }
  }

  test("q_filter_2_compound: OR/NOT predicates still push down") {
    val pushed = scans("q_filter_2_compound").head.metadata("PushedFilters")
    assert(pushed.contains("Or("), s"the OR branch must push as a single filter, got: $pushed")
    assert(pushed.contains("l_discount"), pushed)
  }

  test("q_scan_2_pruned: ReadSchema carries only the three projected columns") {
    val schema = scans("q_scan_2_pruned").head.requiredSchema
    assert(schema.fieldNames.toSet == Set("l_orderkey", "l_linenumber", "l_quantity"),
      s"column pruning failed: ${schema.fieldNames.mkString(",")}")
  }

  test("q_tpch_3_shipping: every scan is pruned (no full-width fact reads in a join)") {
    for (sc <- scans("q_tpch_3_shipping")) {
      val width = sc.requiredSchema.fields.length
      assert(width <= 4,
        s"scan of ${sc.relation.location.rootPaths.headOption.getOrElse("?")} reads " +
          s"$width columns (${sc.requiredSchema.fieldNames.mkString(",")}) — pruning regressed")
    }
  }

  test("q_proj_1_arith: projection-only query never reads unused columns") {
    val sc = scans("q_proj_1_arith")
    assert(sc.nonEmpty)
    val all = graft.sources.Tables(spark, sf, "lineitem").schema.fields.length
    assert(sc.head.requiredSchema.fields.length < all,
      "arith projection must not read the full lineitem width")
  }
}
