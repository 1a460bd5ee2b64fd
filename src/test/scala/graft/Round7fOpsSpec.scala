package graft

import org.apache.spark.sql.functions._

/** Round-7 event/time/window operators: brute-force replications on
  * sf0.001.
  */
class Round7fOpsSpec extends SparkSpec {

  private def events =
    graft.sources.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("q_stream_37_branching: transition counts and entropy replicate per type") {
    val trans = events.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).sliding(2).filter(_.length == 2)
        .map(w => (w(0)._3, w(1)._3))
    }.toSeq
    val exp = trans.groupBy(_._1).view.mapValues { ts =>
      val counts = ts.groupBy(_._2).view.mapValues(_.size.toLong).values.toSeq
      val tot = counts.sum
      val slc = counts.map(c => c.toDouble * math.log(c.toDouble)).sum
      val h = (math.log(tot.toDouble) - slc / tot) / math.log(2.0)
      (tot, counts.max, h)
    }.toMap
    val rows = Registry.byName("q_stream_37_branching").fn(spark, sf).collect()
    rows.foreach { r =>
      val (tot, top, h) = exp(r.getString(0))
      assert(r.getLong(1) == tot)
      assert(math.abs(r.getDouble(2) - h) < 1e-5)
      assert(r.getDouble(3) ==
        math.floor(top.toDouble / tot * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_stream_38_fano: integer-moment formula replicates; all factors positive") {
    val exp = events.groupBy(e => (e._3, e._4 / 3600000000L))
      .view.mapValues(_.size.toLong).toSeq
      .groupBy(_._1._1).view.mapValues { hs =>
        val cs = hs.map(_._2)
        val m = cs.length.toLong; val sc = cs.sum; val scc = cs.map(c => c * c).sum
        (m, sc, (m.toDouble * scc - sc.toDouble * sc) / (m.toDouble * sc))
      }.toMap
    val rows = Registry.byName("q_stream_38_fano").fn(spark, sf).collect()
    rows.foreach { r =>
      val (m, sc, fano) = exp(r.getString(0))
      assert(r.getLong(1) == m && r.getLong(2) == sc)
      assert(r.getDouble(3) == math.floor(fano * 1000000 + 0.5) / 1000000)
      assert(r.getDouble(3) > 0)
    }
  }

  test("q_stream_39_weekend_lift: calendar split replicates") {
    val days = events.map(e => e._4 / 86400000000L).distinct
    def isWe(day: Long) = { val dw = (day + 4) % 7; dw == 0 || dw == 6 }
    val dWe = days.count(isWe).toLong
    val dWd = days.length - dWe
    val exp = events.groupBy(_._3).view.mapValues { es =>
      val we = es.count(e => isWe(e._4 / 86400000000L)).toLong
      (we, es.length - we)
    }.toMap
    val rows = Registry.byName("q_stream_39_weekend_lift").fn(spark, sf).collect()
    rows.foreach { r =>
      val (we, wd) = exp(r.getString(0))
      assert(r.getLong(1) == we && r.getLong(2) == wd)
      val lift = (we.toDouble / dWe) / (wd.toDouble / dWd)
      assert(r.getDouble(5) == math.floor(lift * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_time_23_yoy: growth consistent with the monthly revenue table") {
    val m = graft.sources.Tables(spark, sf, "orders")
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("ym"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Registry.byName("q_time_23_yoy").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ym = r.getLong(0)
      val (c, p) = (m(ym), m(ym - 100))
      assert(r.getDouble(1) == math.floor(c.toDouble / 100 * 100 + 0.5) / 100)
      assert(r.getDouble(3) ==
        math.floor((c.toDouble - p) / p * 1000000 + 0.5) / 1000000)
    }
    // every month with a prior-year sibling appears exactly once
    assert(rows.length == m.keys.count(ym => m.contains(ym - 100)))
  }

  test("q_win_28_ulcer: running-peak drawdowns replicate; ulcer <= max drawdown") {
    val dly = graft.sources.Tables(spark, sf, "orders")
      .groupBy(year(col("o_orderdate")).as("y"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val exp = dly.groupBy(_._1).view.mapValues { ds =>
      val sorted = ds.sortBy(_._2)
      var peak = Long.MinValue
      val d8s = sorted.map { case (_, _, c) =>
        peak = math.max(peak, c)
        math.floor((peak - c).toDouble / peak * 100000000L + 0.5).toLong
      }
      val ulcer = math.sqrt(d8s.map(d => d * d).sum.toDouble / 1e16 / d8s.length) * 100
      (d8s.length.toLong, ulcer, d8s.max.toDouble / 1e8 * 100)
    }.toMap
    val rows = Registry.byName("q_win_28_ulcer").fn(spark, sf).collect()
    rows.foreach { r =>
      val (nd, ulcer, maxDd) = exp(r.getLong(0).toInt)
      assert(r.getLong(1) == nd)
      assert(r.getDouble(2) == math.floor(ulcer * 10000 + 0.5) / 10000)
      assert(r.getDouble(3) == math.floor(maxDd * 10000 + 0.5) / 10000)
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-9)
    }
  }

  test("q_win_29_vwap: exact-cents ratios replicate for every month") {
    val l = graft.sources.Tables(spark, sf, "lineitem")
      .select((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("long").as("ym"),
        col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong, r.getDouble(2).toLong,
        math.floor(r.getDouble(1) / r.getDouble(2) * 100 + 0.5).toLong))
    val exp = l.groupBy(_._1).view.mapValues { ls =>
      (ls.length.toLong, ls.map(_._3).sum, ls.map(_._2).sum, ls.map(_._4).sum)
    }.toMap
    val rows = Registry.byName("q_win_29_vwap").fn(spark, sf).collect()
    rows.foreach { r =>
      val (n, qty, sc, su) = exp(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == qty)
      assert(r.getDouble(3) == math.floor(sc.toDouble / qty / 100 * 10000 + 0.5) / 10000)
      assert(r.getDouble(4) == math.floor(su.toDouble / n / 100 * 10000 + 0.5) / 10000)
    }
  }
}
