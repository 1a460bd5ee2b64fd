package graft

import org.apache.spark.sql.functions._

/** Round-7k blocked/ordered nonparametric tests: brute-force
  * replications on sf0.001.
  */
class Round7kOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }

  private lazy val ordersCust =
    graft.sources.Tables(spark, sf, "orders")
      .join(graft.sources.Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderpriority"), quarter(col("o_orderdate")).as("qtr"),
        col("c_nationkey"), col("c_mktsegment"))
      .collect()

  test("q_stat_36_friedman: rank sums and Q replicate") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_returnflag").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong, r.getString(2)))
    val orderNation = ordersCust.map(r => r.getLong(0) -> r.getInt(5)).toMap
    val rev = li.groupBy(x => (orderNation(x._1), x._3))
      .view.mapValues(_.map(_._2).sum).toMap
    val blocks = rev.keys.map(_._1).toSeq.distinct
      .filter(b => rev.keys.count(_._1 == b) == 3)
    val ranks = blocks.flatMap { b =>
      val vs = rev.filter(_._1._1 == b).toSeq
        .map { case ((_, t), v) => (t, v) }.sortBy(x => (x._2, x._1))
      vs.zipWithIndex.map { case ((t, _), i) => (t, i + 1L) }
    }
    val rs = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = blocks.length.toLong
    val s2 = rs.values.map(r => r * r).sum
    val q = 12.0 * s2 / (n * 12) - 3.0 * n * 4
    val got = Registry.byName("q_stat_36_friedman").fn(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == rs.keys.toSeq.sorted)
    got.foreach { r =>
      assert(r.getLong(1) == rs(r.getString(0)))
      assert(r.getLong(2) == n)
      assert(r.getDouble(3) == rnd(q, 6))
    }
  }

  test("q_stat_37_page_trend: L statistic and z replicate") {
    val cnt = ordersCust.groupBy(r => (r.getInt(5), r.getInt(4)))
      .view.mapValues(_.length.toLong).toMap
    val blocks = cnt.keys.map(_._1).toSeq.distinct
      .filter(b => cnt.keys.count(_._1 == b) == 4)
    val ranks = blocks.flatMap { b =>
      val vs = cnt.filter(_._1._1 == b).toSeq
        .map { case ((_, t), v) => (t, v) }.sortBy(x => (x._2, x._1))
      vs.zipWithIndex.map { case ((t, _), i) => (t, i + 1L) }
    }
    val rs = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = blocks.length.toLong
    val l = rs.map { case (t, r) => t * r }.sum
    val z = (l - n * 25.0) / math.sqrt(n * 25.0 / 3)
    val r = Registry.byName("q_stat_37_page_trend").fn(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((rs(1), rs(2), rs(3), rs(4))))
    assert(r.getLong(5) == l)
    assert(r.getDouble(6) == rnd(z, 4))
  }

  test("q_stat_38_cochran_armitage: per-group fractions and trend z2 replicate") {
    val g = ordersCust.groupBy(_.getString(3).substring(0, 1).toInt)
      .view.mapValues { rows =>
        (rows.length.toLong, rows.count(_.getString(2) == "F").toLong)
      }.toMap
    val nn = g.values.map(_._1).sum
    val rr = g.values.map(_._2).sum
    val sr = g.map { case (s, (_, r)) => s * r }.sum
    val sn = g.map { case (s, (n, _)) => s * n }.sum
    val ssn = g.map { case (s, (n, _)) => s.toLong * s * n }.sum
    val t = nn.toDouble * sr - rr.toDouble * sn
    val v = rr.toDouble * (nn - rr) / nn * (nn.toDouble * ssn - sn.toDouble * sn)
    val got = Registry.byName("q_stat_38_cochran_armitage").fn(spark, sf).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    got.foreach { r =>
      val (n, f) = g(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == f)
      assert(r.getDouble(3) == rnd(f.toDouble / n, 6))
      assert(r.getDouble(4) == rnd(t * t / v / nn, 4))
    }
  }

  test("q_stat_39_mood_median: order-statistic median and 2xk chi2 replicate") {
    val rows = ordersCust.map(r =>
      (math.floor(r.getDouble(1) * 100 + 0.5).toLong, r.getString(6)))
    val sorted = rows.map(_._1).sorted
    val med = sorted((rows.length + 1) / 2 - 1)
    val cls = rows.groupBy(_._2).view.mapValues { g =>
      (g.count(_._1 > med).toLong, g.count(_._1 <= med).toLong)
    }.toMap
    val ta = cls.values.map(_._1).sum
    val tl = cls.values.map(_._2).sum
    val nn = (ta + tl).toDouble
    val chi2 = cls.values.map { case (a, l) =>
      val rt = (a + l).toDouble
      val ea = rt * ta / nn; val el = rt * tl / nn
      (a - ea) * (a - ea) / ea + (l - el) * (l - el) / el
    }.sum
    val got = Registry.byName("q_stat_39_mood_median").fn(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == cls.keys.toSeq.sorted)
    got.foreach { r =>
      val (a, l) = cls(r.getString(0))
      assert(r.getLong(1) == a && r.getLong(2) == l)
      assert(r.getDouble(3) == rnd((a + l).toDouble * ta / nn, 4))
      assert(r.getDouble(4) == rnd(chi2, 4))
    }
    // the median split must actually discriminate (not all-above/all-below)
    assert(ta > 0 && tl > 0)
  }

  test("q_stat_40_odds_ratio: 2x2 cells and Woolf CI replicate") {
    val exposed = (p: String) => p == "1-URGENT" || p == "2-HIGH"
    val a = ordersCust.count(r => exposed(r.getString(3)) && r.getString(2) == "F").toLong
    val b = ordersCust.count(r => exposed(r.getString(3)) && r.getString(2) != "F").toLong
    val c = ordersCust.count(r => !exposed(r.getString(3)) && r.getString(2) == "F").toLong
    val dd = ordersCust.count(r => !exposed(r.getString(3)) && r.getString(2) != "F").toLong
    val orr = a.toDouble * dd / (b.toDouble * c)
    val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd)
    val r = Registry.byName("q_stat_40_odds_ratio").fn(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((a, b, c, dd)))
    assert(r.getDouble(4) == rnd(orr, 6))
    assert(r.getDouble(5) == rnd(math.log(orr), 6))
    assert(r.getDouble(6) == rnd(se, 6))
    assert(r.getDouble(7) == rnd(math.log(orr) - 1.96 * se, 6))
    assert(r.getDouble(8) == rnd(math.log(orr) + 1.96 * se, 6))
    // CI is a proper interval around the point estimate
    assert(r.getDouble(7) < r.getDouble(5) && r.getDouble(5) < r.getDouble(8))
  }

  test("q_stat_41_cochran_q: over-representation design is non-degenerate; Q replicates") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase", "error"))
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val x = ev.groupBy(_._1).map { case (_, es) =>
      val nc = es.count(_._2 == "click").toLong
      val np = es.count(_._2 == "purchase").toLong
      val ne = es.count(_._2 == "error").toLong
      val tot = nc + np + ne
      (if (3 * nc > tot) 1L else 0L, if (3 * np > tot) 1L else 0L,
        if (3 * ne > tot) 1L else 0L)
    }.toSeq
    val cc = x.map(_._1).sum; val cp = x.map(_._2).sum; val ce = x.map(_._3).sum
    val nn = x.map(t => t._1 + t._2 + t._3).sum
    val r2 = x.map(t => { val s = t._1 + t._2 + t._3; s * s }).sum
    val q = 2.0 * (3.0 * (cc.toDouble * cc + cp.toDouble * cp + ce.toDouble * ce)
      - nn.toDouble * nn) / (3.0 * nn - r2)
    val r = Registry.byName("q_stat_41_cochran_q").fn(spark, sf).collect().head
    assert(r.getLong(0) == x.length.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((cc, cp, ce)))
    assert(r.getDouble(4) == rnd(q, 6))
    // denominator is strictly positive (the design can't saturate)
    assert(3 * nn > r2)
  }

  test("q_stat_42_pairwise_welch: every ordered segment pair with Welch t replicates") {
    val cust = graft.sources.Tables(spark, sf, "customer")
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val g = cust.groupBy(_._1).view.mapValues { rows =>
      val n = rows.length.toLong
      val sc = rows.map(_._2).sum
      val sc2 = rows.map(x => x._2 * x._2).sum
      (n, sc, sc2)
    }.toMap
    val segs = g.keys.toSeq.sorted
    val exp = for (i <- segs.indices; j <- segs.indices if segs(i) < segs(j)) yield {
      val (na, sca, sc2a) = g(segs(i)); val (nb, scb, sc2b) = g(segs(j))
      val diff = sca.toDouble / na - scb.toDouble / nb
      val va = (sc2a - sca.toDouble * sca / na) / (na - 1) / na
      val vb = (sc2b - scb.toDouble * scb / nb) / (nb - 1) / nb
      (segs(i), segs(j), rnd(diff / 100, 2), rnd(diff / math.sqrt(va + vb), 4))
    }
    val got = Registry.byName("q_stat_42_pairwise_welch").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == exp.toSeq)
    assert(got.length == segs.length * (segs.length - 1) / 2)
  }
}
