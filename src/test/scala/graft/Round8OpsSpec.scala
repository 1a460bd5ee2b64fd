package graft

import org.apache.spark.sql.functions._

/** Round-8 queries replicated against independent driver-side scala
  * computations on the sf0.001 fixture (house style: the oracle gate
  * checks DuckDB agreement; these pins check the MATH).
  */
class Round8OpsSpec extends SparkSpec {

  private def rnd(x: Double, p: Int): Double = {
    val m = math.pow(10, p); math.floor(x * m + 0.5) / m
  }

  test("q_sort_9_percentile_grid: every pick equals the sorted-array order statistic") {
    val cents = graft.sources.Tables(spark, sf, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    def pick(r: Long): Double = cents((r - 1).toInt).toDouble / 100
    val got = Registry.byName("q_sort_9_percentile_grid").fn(spark, sf).collect().head
    assert(got.getLong(0) == n)
    val expected = Seq((n + 9) / 10, (n + 3) / 4, (n + 1) / 2,
      (3 * n + 3) / 4, (9 * n + 9) / 10, (99 * n + 99) / 100).map(pick)
    expected.zipWithIndex.foreach { case (e, i) =>
      assert(got.getDouble(i + 1) == e, s"p at index $i")
    }
    // and the grid is non-degenerate on this fixture
    assert(got.getDouble(1) < got.getDouble(6))
  }

  test("q_agg_48_top_share: shares replicate from a driver-side sort; curve is monotone") {
    val spend = graft.sources.Tables(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = spend.sortBy { case (c, s) => (-s, c) }.map(_._2)
    val n = sorted.length.toLong
    val tot = sorted.sum.toDouble
    def share(k: Long): Double = rnd(sorted.take(k.toInt).sum / tot, 6)
    val got = Registry.byName("q_agg_48_top_share").fn(spark, sf).collect().head
    assert(got.getLong(0) == n)
    assert(got.getDouble(1) == share((n + 99) / 100))
    assert(got.getDouble(2) == share((n + 19) / 20))
    assert(got.getDouble(3) == share((n + 9) / 10))
    assert(got.getDouble(1) < got.getDouble(2) && got.getDouble(2) < got.getDouble(3))
    assert(got.getDouble(1) > 0.01, "top-1% must hold MORE than a uniform share")
  }

  test("q_stat_47_ecdf_probes: F(x) replicates from raw counts and is monotone in x") {
    val cents = graft.sources.Tables(spark, sf, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"))
      .collect().map(_.getLong(0))
    val n = cents.length.toLong
    def f(x: Long): Double = rnd(cents.count(_ <= x).toDouble / n, 6)
    val got = Registry.byName("q_stat_47_ecdf_probes").fn(spark, sf).collect().head
    assert(got.getLong(0) == n)
    val probes = Seq(10000000L, 20000000L, 30000000L, 40000000L)
    probes.zipWithIndex.foreach { case (p, i) =>
      assert(got.getDouble(i + 1) == f(p), s"F at probe $p")
    }
    // non-vacuous on this fixture: strictly interior and increasing
    assert(got.getDouble(1) > 0 && got.getDouble(4) < 1)
    assert(got.getDouble(1) <= got.getDouble(2)
      && got.getDouble(2) <= got.getDouble(3)
      && got.getDouble(3) <= got.getDouble(4))
  }
}
