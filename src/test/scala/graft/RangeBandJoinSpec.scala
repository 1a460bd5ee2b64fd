package graft

import graft.plans.RangeBandJoinRule
import org.apache.spark.sql.functions._

/** The range-join optimizer rule: exact same results as the naive plan,
  * but a hash band join instead of a nested loop.
  */
class RangeBandJoinSpec extends SparkSpec {

  private def naiveRangeJoin() = {
    // one week of lineitems × orders whose 90-day window covers them —
    // NO equi predicate, pure range condition.
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-06-08").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    val o = graft.sources.Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-03-01").cast("timestamp")
        && col("o_orderdate") <= lit("1996-06-08").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("o_orderdate") + expr("INTERVAL 90 DAY")).as("o_valid_until"))
    li.join(o, col("l_shipdate") >= col("o_orderdate")
      && col("l_shipdate") <= col("o_valid_until"))
  }

  test("band-join rewrite preserves results exactly and removes the nested loop") {
    // Other suites may have installed the rule on the shared session
    // (q_join_12_range_auto does) — start from a clean slate.
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_.isInstanceOf[RangeBandJoinRule])
    try {
      val before = naiveRangeJoin()
      val planBefore = before.queryExecution.executedPlan.toString
      assert(planBefore.contains("BroadcastNestedLoopJoin") || planBefore.contains("CartesianProduct"),
        "expected the naive plan to be a nested loop:\n" + planBefore)
      val expected = before.orderBy("l_orderkey", "l_linenumber", "o_orderkey").collect().toSeq
      RangeBandJoinRule.install(spark)
      val after = naiveRangeJoin()
      val planAfter = after.queryExecution.executedPlan.toString
      assert(!planAfter.contains("BroadcastNestedLoopJoin") && !planAfter.contains("CartesianProduct"),
        "rule did not fire:\n" + planAfter)
      assert(planAfter.contains("HashJoin") || planAfter.contains("SortMergeJoin"), planAfter)
      val got = after.orderBy("l_orderkey", "l_linenumber", "o_orderkey").collect().toSeq
      assert(got == expected)
      assert(got.nonEmpty)
    } finally spark.experimental.extraOptimizations = prev
  }

  private def naiveNumericRangeJoin() = {
    // numeric range, value column on the RIGHT side (mirrored shape)
    val p = graft.sources.Tables(spark, sf, "part")
    val a = p.select(col("p_partkey").as("pk"),
      (col("p_retailprice") - lit(5.0)).as("lo"), (col("p_retailprice") + lit(5.0)).as("hi"))
    val b = p.select(col("p_partkey").as("pk_b"), col("p_retailprice").as("bp"))
    a.join(b, col("bp") >= col("lo") && col("bp") <= col("hi"))
  }

  test("numeric + mirrored-side range join is banded too") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_.isInstanceOf[RangeBandJoinRule])
    try {
      val before = naiveNumericRangeJoin()
      val planBefore = before.queryExecution.executedPlan.toString
      assert(planBefore.contains("BroadcastNestedLoopJoin") || planBefore.contains("CartesianProduct"),
        "expected the naive plan to be a nested loop:\n" + planBefore)
      val expected = before.orderBy("pk", "pk_b").collect().toSeq
      RangeBandJoinRule.install(spark)
      val after = naiveNumericRangeJoin()
      val planAfter = after.queryExecution.executedPlan.toString
      assert(!planAfter.contains("BroadcastNestedLoopJoin") && !planAfter.contains("CartesianProduct"),
        "rule did not fire:\n" + planAfter)
      assert(planAfter.contains("HashJoin") || planAfter.contains("SortMergeJoin"), planAfter)
      val got = after.orderBy("pk", "pk_b").collect().toSeq
      assert(got == expected)
      assert(got.nonEmpty)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("band width is session-tunable via spark.graft.rangeJoin.numericBandWidth") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_.isInstanceOf[RangeBandJoinRule])
    try {
      RangeBandJoinRule.install(spark)
      val expected = naiveNumericRangeJoin().orderBy("pk", "pk_b").collect().toSeq
      spark.conf.set("spark.graft.rangeJoin.numericBandWidth", "3.0")
      val narrow = naiveNumericRangeJoin()
      val plan = narrow.queryExecution.optimizedPlan.toString
      assert(plan.contains("/ 3.0"), "expected width-3 banding in the plan:\n" + plan)
      assert(narrow.orderBy("pk", "pk_b").collect().toSeq == expected,
        "rewrite must stay exact at any width")
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.numericBandWidth")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("misconfigured knobs (zero/negative width) fall back to defaults, not silent empties") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_.isInstanceOf[RangeBandJoinRule])
    try {
      RangeBandJoinRule.install(spark)
      val expectedN = naiveNumericRangeJoin().orderBy("pk", "pk_b").collect().toSeq
      val expectedT = naiveRangeJoin().orderBy("l_orderkey", "l_linenumber", "o_orderkey").collect().toSeq
      // A non-positive width would flip the fractional floor-division's
      // monotonicity (band(lo) > band(hi) → empty band arrays → all
      // matches silently dropped) or null the timestamp bands
      // (IntegralDivide by 0). The rule must ignore such values.
      for (bad <- Seq("-5.0", "0", "NaN")) {
        spark.conf.set("spark.graft.rangeJoin.numericBandWidth", bad)
        assert(naiveNumericRangeJoin().orderBy("pk", "pk_b").collect().toSeq == expectedN,
          s"numericBandWidth=$bad must not change results")
      }
      for (bad <- Seq("0", "-86400")) {
        spark.conf.set("spark.graft.rangeJoin.bandSeconds", bad)
        assert(naiveRangeJoin().orderBy("l_orderkey", "l_linenumber", "o_orderkey").collect().toSeq == expectedT,
          s"bandSeconds=$bad must not change results")
      }
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.numericBandWidth")
      spark.conf.unset("spark.graft.rangeJoin.bandSeconds")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("adaptive width: literal base±c bounds set the band width to the span") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_.isInstanceOf[RangeBandJoinRule])
    try {
      RangeBandJoinRule.install(spark)
      val p = graft.sources.Tables(spark, sf, "part")
      val a = p.select(col("p_partkey").as("pk"),
        (col("p_retailprice") - lit(1.5)).as("lo"), (col("p_retailprice") + lit(1.0)).as("hi"))
      val b = p.select(col("p_partkey").as("pk_b"), col("p_retailprice").as("bp"))
      val joined = a.join(b, col("bp") >= col("lo") && col("bp") <= col("hi"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("/ 2.5"), "expected span-derived width 2.5 in:\n" + plan)
      // exactness unchanged under the inferred width
      val expected = p.select(col("p_partkey"), col("p_retailprice")).collect()
        .flatMap { r =>
          val (pk, pr) = (r.getLong(0), r.getDouble(1))
          p.select(col("p_partkey"), col("p_retailprice")).collect()
            .filter(x => x.getDouble(1) >= pr - 1.5 && x.getDouble(1) <= pr + 1.0)
            .map(x => (pk, x.getLong(0)))
        }.sortBy(identity).toSeq
      val got = joined.select(col("pk"), col("pk_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
      assert(got == expected)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule leaves equi joins and already-banded joins untouched") {
    val prev = spark.experimental.extraOptimizations
    try {
      RangeBandJoinRule.install(spark)
      // equi join: must stay a single hash join with NO Generate/explode
      val li = graft.sources.Tables(spark, sf, "lineitem")
      val o = graft.sources.Tables(spark, sf, "orders")
      val equi = li.join(o, li("l_orderkey") === o("o_orderkey")
        && li("l_shipdate") >= o("o_orderdate"))
      val plan = equi.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"), "rule must not fire on equi joins:\n" + plan)
      // declared manual band join still verifies (idempotence guard)
      assert(Registry.byName("q_join_8_theta_range").fn(spark, sf).count() > 0)
    } finally spark.experimental.extraOptimizations = prev
  }
}
