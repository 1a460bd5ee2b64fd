package graft

import org.apache.spark.sql.functions._

/** Round-7h operators: brute-force replications on sf0.001. */
class Round7hOpsSpec extends SparkSpec {

  private def dailyCents = graft.sources.Tables(spark, sf, "orders")
    .groupBy(year(col("o_orderdate")).as("y"),
      datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
    .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

  test("q_priv_5_suppression_cost: curve is monotone in k and replicates") {
    val sizes = graft.sources.Tables(spark, sf, "customer")
      .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(2))
    val rows = Registry.byName("q_priv_5_suppression_cost").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(2L, 5L, 10L, 20L))
    rows.foreach { case (k, pub, sup, gs) =>
      assert(pub == sizes.filter(_ >= k).sum, s"k=$k published")
      assert(sup == sizes.filter(_ < k).sum, s"k=$k suppressed")
      assert(gs == sizes.count(_ < k).toLong, s"k=$k groups")
    }
    // suppression cost can only grow with k
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("q_scan_23_zonemap_sim: value-sorted layout prunes at least as well; blocks replicate") {
    val o = graft.sources.Tables(spark, sf, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        col("o_orderkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2)))
    def prunable(sorted: Array[Long]): (Long, Long) = {
      val blocks = sorted.grouped(512).toArray
      (blocks.length.toLong, blocks.count(_.max < 40000000L).toLong)
    }
    val byDate = o.sortBy(x => (x._3.toString, x._2)).map(_._1)
    val byValue = o.sortBy(x => (x._1, x._2)).map(_._1)
    val (nb1, np1) = prunable(byDate)
    val (nb2, np2) = prunable(byValue)
    val rows = Registry.byName("q_scan_23_zonemap_sim").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows(0) == (("a_by_date", nb1, np1)))
    assert(rows(1) == (("b_by_value", nb2, np2)))
    assert(np2 >= np1, "sorting by the predicate column cannot prune worse")
  }

  test("q_win_30_sortino: dollar diffs replicate; downside uses only negative moves") {
    val exp = dailyCents.groupBy(_._1).view.mapValues { ds =>
      val sorted = ds.sortBy(_._2)
      val diffs = sorted.sliding(2).filter(_.length == 2)
        .map(w => math.floor((w(1)._3.toDouble - w(0)._3) / 100 + 0.5).toLong).toSeq
      val ddn = diffs.filter(_ < 0).map(x => x * x).sum
      (diffs.length.toLong, diffs.sum, ddn)
    }.toMap
    val rows = Registry.byName("q_win_30_sortino").fn(spark, sf).collect()
    rows.foreach { r =>
      val (n, sd, ddn) = exp(r.getLong(0).toInt)
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == math.floor(sd.toDouble / n * 100 + 0.5) / 100)
      assert(r.getDouble(3) ==
        math.floor(math.sqrt(ddn.toDouble / n) * 100 + 0.5) / 100)
    }
  }

  test("q_win_31_underwater: recovery-time algebra replicates") {
    val exp = dailyCents.groupBy(_._1).view.mapValues { ds =>
      val sorted = ds.sortBy(_._2)
      var peak = Long.MinValue
      var lastPeakDay = 0L
      val unders = sorted.map { case (_, day, c) =>
        peak = math.max(peak, c)
        if (c >= peak) lastPeakDay = day
        day - lastPeakDay
      }
      (unders.length.toLong, unders.max, unders.sum)
    }.toMap
    val rows = Registry.byName("q_win_31_underwater").fn(spark, sf).collect()
    rows.foreach { r =>
      val (n, mx, sm) = exp(r.getLong(0).toInt)
      assert(r.getLong(1) == n && r.getLong(2) == mx)
      assert(r.getDouble(3) == math.floor(sm.toDouble / n * 10000 + 0.5) / 10000)
    }
  }

  test("q_agg_43_hill_tail: quantized ln sums replicate; alpha positive") {
    val cents = graft.sources.Tables(spark, sf, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (c, k) => (-c, k) }.take(101)
    val ln6 = cents.map(c => math.floor(math.log(c._1.toDouble) * 1000000 + 0.5).toLong)
    val s6 = ln6.take(100).sum
    val ref6 = ln6(100)
    val alpha = 100.0 * 1000000 / (s6 - 100 * ref6)
    val r = Registry.byName("q_agg_43_hill_tail").fn(spark, sf).collect().head
    assert(r.getLong(0) == 100L)
    assert(r.getDouble(1) ==
      math.floor(cents(100)._1.toDouble / 100 * 100 + 0.5) / 100)
    assert(r.getDouble(2) == math.floor(alpha * 10000 + 0.5) / 10000)
    assert(r.getDouble(2) > 0)
  }
}
