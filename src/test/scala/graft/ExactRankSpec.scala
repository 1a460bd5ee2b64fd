package graft

import graft.api.Pipelines
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pipelines.exactRankPick / exactGlobalRank / ntileOfRank — the
  * range-partitioned replacements for the single-partition
  * `Window.orderBy` global-sort pattern (VERDICT r7 item 1). Parity is
  * pinned EXACTLY against the single-partition reference forms on the
  * sf0.001 orders fixture, and the plan is pinned to contain a
  * RangePartitioning exchange (not a one-task global sort).
  */
class ExactRankSpec extends SparkSpec {

  private lazy val o = graft.sources.Tables(spark, sf, "orders")
    .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      col("o_orderkey"))

  test("exactRankPick matches the single-partition rank pick at several ranks") {
    val ref = o.select(col("cents"),
        row_number().over(Window.orderBy("cents", "o_orderkey")).cast("long").as("rn"))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val n = ref.size.toLong
    val ranks = Seq(1L, 2L, n / 3, (n + 1) / 2, n - 1, n).distinct
    val (gotN, picks) = Pipelines.exactRankPick(o, "cents", _ => ranks)
    assert(gotN == n)
    for (r <- ranks) assert(picks(r) == ref(r), s"rank $r")
  }

  test("exactRankPick handles duplicate and boundary ranks") {
    val (n, picks) = Pipelines.exactRankPick(o, "cents", nn => Seq(1L, 1L, nn))
    assert(picks.size == 2 && n > 0)
    val mn = o.agg(min("cents"), max("cents")).collect().head
    assert(picks(1L) == mn.getLong(0) && picks(n) == mn.getLong(1))
  }

  test("exactGlobalRank matches the single-partition row_number on a unique order") {
    val ref = o.select(col("o_orderkey"),
        row_number().over(Window.orderBy("cents", "o_orderkey")).cast("long").as("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Pipelines.exactGlobalRank(o, Seq("cents", "o_orderkey"), "rk")
      .select("o_orderkey", "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("exactGlobalRank plan shows RangePartitioning, not a one-task sort") {
    // the fact shuffle is the range exchange (it sits behind the
    // localCheckpoint in the helper, so pin its shape directly)
    val rangedPlan = o.repartitionByRange(8, col("cents"), col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(rangedPlan.toLowerCase.contains("rangepartitioning"), rangedPlan.take(2000))
    // the downstream rank stage is pid-partitioned (parallel), never a
    // SinglePartition exchange of the fact
    val plan = Pipelines.exactGlobalRank(o, Seq("cents", "o_orderkey"), "rk")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(2000))
    assert(plan.toLowerCase.contains("hashpartitioning(__pid"), plan.take(2000))
  }

  test("ntileOfRank matches the ntile builtin for even and ragged splits") {
    for (k <- Seq(3, 7, 10)) {
      val ref = o.select(col("o_orderkey"),
          ntile(k).over(Window.orderBy("cents", "o_orderkey")).cast("long").as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = ref.size.toLong
      val got = Pipelines.exactGlobalRank(o, Seq("cents", "o_orderkey"), "rk")
        .select(col("o_orderkey"), Pipelines.ntileOfRank(col("rk"), n, k).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref, s"k=$k")
    }
  }

  test("ntileOfRank when n < k assigns rank as bucket (builtin semantics)") {
    import spark.implicits._
    val tiny = Seq(10L, 20L, 30L).toDF("v")
    val ref = tiny.select(col("v"),
        ntile(10).over(Window.orderBy("v")).cast("long").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Pipelines.exactGlobalRank(tiny, Seq("v"), "rk")
      .select(col("v"), Pipelines.ntileOfRank(col("rk"), 3L, 10).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref)
  }
}
