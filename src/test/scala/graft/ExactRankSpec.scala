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
    // the fact shuffle is the range exchange; the helper's rank stage
    // then maps the sorted partitions with per-partition offsets (RDD
    // two-pass, rfmSegments' machinery) — so the ONLY wide op in the
    // whole build is the RangePartitioning exchange, and nothing is a
    // SinglePartition exchange of the fact
    val rangedPlan = o.repartitionByRange(8, col("cents"), col("o_orderkey"))
      .sortWithinPartitions("cents", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(rangedPlan.toLowerCase.contains("rangepartitioning"), rangedPlan.take(2000))
    assert(!rangedPlan.contains("SinglePartition"), rangedPlan.take(2000))
    val plan = Pipelines.exactGlobalRank(o, Seq("cents", "o_orderkey"), "rk")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(2000))
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

  test("prefixSum matches the single-partition running-sum window bit-exactly") {
    val toks = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = toks.withColumn("c", sum("tok").over(w))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = Pipelines.prefixSum(toks, Seq("doc_id"), "tok", "c")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == ref)
  }

  test("prefixSumN carries two running sums through one shuffle, matching the windows") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, i % 7, i % 3)).toDF("k", "a", "b")
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.select(col("k"), sum("a").over(w).as("ca"), sum("b").over(w).as("cb"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Pipelines.prefixSumN(df, Seq("k"), Seq("a" -> "ca", "b" -> "cb"))
      .select("k", "ca", "cb")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == ref)
  }

  test("adjacentPairs emits exactly the global-lead pairs, boundaries stitched") {
    val ids = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("id")).distinct()
    val ref = ids.withColumn("nxt", lead("id", 1).over(Window.orderBy("id")))
      .filter(col("nxt").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Pipelines.adjacentPairs(ids, "id", "nxt")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref && got.nonEmpty)
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
