package graft

import org.apache.spark.sql.functions._

/** Round-5ac operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5acOpsSpec extends SparkSpec {

  private lazy val custRegion: Map[Long, String] = {
    val n2r = graft.sources.Tables(spark, sf, "nation")
      .join(graft.sources.Tables(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "r_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    graft.sources.Tables(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> n2r(r.getInt(1))).toMap
  }

  private lazy val orders =
    graft.sources.Tables(spark, sf, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))

  test("q_agg_40_share_of_parent: region shares sum to 1 within each region") {
    val rows = Registry.byName("q_agg_40_share_of_parent").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).values.foreach { reg =>
      assert(math.abs(reg.map(_._4).sum - 1.0) < 1e-4)
    }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // share_of_total <= share_of_region always (region total <= grand total)
    rows.foreach(r => assert(r._5 <= r._4 + 1e-9))
  }

  test("q_win_25_pareto: the crossing rank is minimal and exact") {
    val byRegion = orders.map { case (ck, c) => (custRegion(ck), ck, c) }
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toSeq
      .map { case ((reg, ck), c) => (reg, ck, c) }
      .groupBy(_._1)
    val expected = byRegion.map { case (reg, cs) =>
      val sorted = cs.sortBy(t => (-t._3, t._2)).map(_._3)
      val tot = sorted.sum
      var cum = 0L
      val rn = sorted.indexWhere { c => cum += c; 5 * cum >= 4 * tot } + 1
      reg -> ((cs.size.toLong, rn.toLong))
    }
    val got = Registry.byName("q_win_25_pareto").fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    expected.foreach { case (reg, (n, rn)) =>
      assert(got(reg) == ((n, rn)), reg)
    }
  }

  test("q_time_18_sma_cross: sign changes of the integer LCM diff replicate") {
    val daily = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("unix_micros(ts) div 86400000000 AS d", "value").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => math.floor(r.getDouble(1) * 100 + 0.5).toLong).sum)
      .toSeq.sortBy(_._1)
    val cents = daily.map(_._2)
    val diffs = daily.indices.collect {
      case i if i >= 19 =>
        val s5 = cents.slice(i - 4, i + 1).sum
        val s20 = cents.slice(i - 19, i + 1).sum
        (daily(i)._1, 4 * s5 - s20)
    }
    val expected = diffs.zip(diffs.tail).collect {
      case ((_, prev), (d, cur)) if prev <= 0 && cur > 0 => (d, 1L)
      case ((_, prev), (d, cur)) if prev > 0 && cur <= 0 => (d, -1L)
    }
    val got = Registry.byName("q_time_18_sma_cross").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
  }

  test("q_dedup_23_first_seen: copies attribute to the min-doc_id holder") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").distinct.sorted.mkString(" ")))
    val byText = docs.groupBy(_._3)
    val expected = byText.values.flatMap { ds =>
      val first = ds.minBy(_._1)
      ds.filter(_._1 > first._1).map(d => (d._2, first._2))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((c, f), n) => (c, f, n) }
      .sortBy(t => (-t._3, t._1, t._2)).take(20)
    val got = Registry.byName("q_dedup_23_first_seen").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }
}
