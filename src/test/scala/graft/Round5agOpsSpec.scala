package graft

import org.apache.spark.sql.functions._

/** Round-5ag operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5agOpsSpec extends SparkSpec {

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q_stream_32_retention_curve: set-algebra retention replicates") {
    val ud = events.map(e => (e._1, e._3 / 86400000000L)).distinct
    val act = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val d0 = act.view.mapValues(_.min).toMap
    def ret(k: Int) = act.count { case (u, days) => days.contains(d0(u) + k) }.toLong
    val row = Registry.byName("q_stream_32_retention_curve").fn(spark, sf).collect().head
    assert(row.getLong(0) == act.size.toLong)
    assert(row.getLong(1) == ret(1))
    assert(row.getLong(2) == ret(7))
    assert(row.getLong(3) == ret(30))
    assert(row.getDouble(4) == math.floor(ret(1).toDouble / act.size * 1e6 + 0.5) / 1e6)
    assert(row.getDouble(5) == math.floor(ret(7).toDouble / act.size * 1e6 + 0.5) / 1e6)
  }

  test("q_stream_33_gap_tail: log-binned OLS slope replicates and decays") {
    val gaps = events.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._3, e._2)).map(_._3)
      o.zip(o.tail).map { case (a, b) => b - a }
    }.filter(_ >= 1000000L)
    val hist = gaps.map(g => math.floor(math.log(g.toDouble / 1e6) / math.log(2.0)).toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mode = hist.toSeq.sortBy { case (b, n) => (-n, b) }.head._1
    val bins = hist.filter { case (b, n) => n >= 4 && b >= mode }
    val pts = bins.toSeq.map { case (b, n) =>
      (b.toDouble, math.floor(math.log(n.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong)
    }
    val k = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val sy = pts.map(_._2).sum; val sxy = pts.map(p => p._1 * p._2).sum
    val slope = math.floor((k * sxy - sx * sy) / (k * sxx - sx * sx) / 1e6 * 1e4 + 0.5) / 1e4
    val row = Registry.byName("q_stream_33_gap_tail").fn(spark, sf).collect().head
    assert(row.getLong(0) == pts.length.toLong)
    assert(row.getDouble(1) == slope)
    // gap frequencies decay with gap size: negative tail slope
    assert(row.getDouble(1) < 0)
  }
}
