package graft

import org.apache.spark.sql.functions._

/** Round-5ad operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5adOpsSpec extends SparkSpec {

  test("q_time_19_stl_anomaly: integer median/MAD flags replicate") {
    val daily = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("unix_micros(ts) div 86400000000 AS d", "value").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => math.floor(r.getDouble(1) * 100 + 0.5).toLong).sum)
      .toSeq.sortBy(_._1)
    val n = daily.length
    val f = (3 until n - 3).map { i =>
      val ts7 = daily.slice(i - 3, i + 4).map(_._2).sum
      (daily(i)._1, daily(i)._2, daily(i)._1 % 7, 7 * daily(i)._2 - ts7)
    }
    val sea = f.groupBy(_._3).view.mapValues { xs =>
      math.floor(xs.map(_._4).sum.toDouble / xs.size + 0.5).toLong
    }.toMap
    val res = f.map(x => (x._1, x._2, x._4 - sea(x._3)))
    def medPick(xs: Seq[(Long, Long)]): Long = {
      // (sortKey, dday) ordering, pick rank (n+1)/2
      val sorted = xs.sortBy(identity)
      sorted((xs.size + 1) / 2 - 1)._1
    }
    val med = medPick(res.map(r => (r._3, r._1)))
    val mad = medPick(res.map(r => (math.abs(r._3 - med), r._1)))
    val expected = res.filter(r => math.abs(r._3 - med) > 2 * mad)
      .map(r => (r._1, math.floor(r._2.toDouble / 100 * 100 + 0.5) / 100,
        math.floor(r._3.toDouble / 7 / 100 * 100 + 0.5) / 100,
        if (r._3 - med > 0) 1L else -1L))
      .sortBy(_._1)
    val got = Registry.byName("q_time_19_stl_anomaly").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == expected)
  }

  test("q_scan_20_json_multiline: pretty-array roundtrip preserves every value") {
    val region = graft.sources.Tables(spark, sf, "region")
      .select("r_regionkey", "r_name").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val row = Registry.byName("q_scan_20_json_multiline").fn(spark, sf).collect().head
    assert(row.getLong(0) == region.length.toLong)
    assert(row.getLong(1) == region.map(_._1.toLong).sum)
    assert(row.getLong(2) == region.map(_._2.length.toLong).sum)
  }

  test("q_agg_41_multi_distinct: one Expand pass; counts replicate") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey",
        "year(l_shipdate) * 100 + month(l_shipdate) AS ym").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val row = Registry.byName("q_agg_41_multi_distinct").fn(spark, sf).collect().head
    assert(row.getLong(0) == li.length.toLong)
    assert(row.getLong(1) == li.map(_._1).distinct.length.toLong)
    assert(row.getLong(2) == li.map(_._2).distinct.length.toLong)
    assert(row.getLong(3) == li.map(_._3).distinct.length.toLong)
    assert(row.getLong(4) == li.map(_._4).distinct.length.toLong)
    // plan shape: the multi-distinct rewrite produces Expand, and the
    // fact is scanned exactly once
    val plan = Registry.byName("q_agg_41_multi_distinct").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "multi-distinct should plan one Expand:\n" + plan)
    assert("lineitem".r.findAllIn(plan).length <= 2, "fact scanned more than once:\n" + plan)
  }
}
