package graft

import graft.sources.Tables

/** Round-5 operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–4 suites: recompute the statistic from collected fixture rows
  * with the identical quantization, assert bit-equality).
  */
class Round5OpsSpec extends SparkSpec {

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private lazy val tokenCounts: Map[(String, String), Long] =
    docs.flatMap(d => d._3.split(" ").map(t => (d._2, t)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("q_text_32_jsd: quantized-contribution sum replicates; 0 <= jsd <= ln 2") {
    val ct = tokenCounts.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val nl = tokenCounts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val nn = tokenCounts.values.sum
    val expected = tokenCounts.groupBy(_._1._1).map { case (lang, m) =>
      val jsum9 = m.map { case ((_, tok), c) =>
        val p = c.toDouble / nl(lang)
        val q = ct(tok).toDouble / nn
        val mid = (p + q) / 2
        math.floor((0.5 * p * math.log(p / mid) + 0.5 * q * math.log(q / mid)) * 1e9 + 0.5).toLong
      }.sum
      val sl = m.keysIterator.map(k => ct(k._2)).sum
      lang -> q6(jsum9.toDouble / 1e9 + 0.5 * math.log(2.0) * (1 - sl.toDouble / nn))
    }
    val got = Registry.byName("q_text_32_jsd").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val j = expected(r.getString(0))
      assert(r.getDouble(3) == j, s"${r.getString(0)}: ${r.getDouble(3)} != $j")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= math.log(2.0) + 1e-9)
      assert(r.getLong(1) == nl(r.getString(0)))
    }
  }

  test("q_text_33_readability: integer counts and closed-form score replicate") {
    val vowel = "[aeiouy]+".r
    val expected = docs.groupBy(_._2).map { case (lang, ds) =>
      val words = ds.map(_._3.split(" ").length.toLong).sum
      val syl = ds.map(d => vowel.findAllIn(d._3).length.toLong).sum
      val chars = ds.map(_._3.count(_ != ' ').toLong).sum
      val nDocs = ds.length.toLong
      lang -> (nDocs, words,
        q4(chars.toDouble / words), q4(syl.toDouble / words),
        q4(206.835 - 1.015 * (words.toDouble / nDocs) - 84.6 * (syl.toDouble / words)))
    }
    val got = Registry.byName("q_text_33_readability").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, w, awl, spw, fl) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == w)
      assert(r.getDouble(3) == awl && r.getDouble(4) == spw && r.getDouble(5) == fl,
        s"${r.getString(0)}: ${(r.getDouble(3), r.getDouble(4), r.getDouble(5))} != ${(awl, spw, fl)}")
    }
  }

  test("q_text_34_simpson: exact-rational concentration replicates; inv in [1, vocab]") {
    val expected = tokenCounts.groupBy(_._1._1).map { case (lang, m) =>
      val n = m.values.sum
      val num = m.values.map(c => c * (c - 1)).sum
      lang -> (n, m.size.toLong,
        q6(num.toDouble / (n.toDouble * (n - 1).toDouble)),
        q4(n.toDouble * (n - 1).toDouble / num.toDouble))
    }
    val got = Registry.byName("q_text_34_simpson").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, v, sim, inv) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == v)
      assert(r.getDouble(3) == sim && r.getDouble(4) == inv)
      assert(r.getDouble(4) >= 1.0 && r.getDouble(4) <= v.toDouble)
    }
  }

  test("q_stat_11_anova: dollars2-quantized F and eta2 replicate; eta2 in [0,1]") {
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val g = cents.groupBy(_._1).map { case (p, rows) =>
      val n = rows.length.toLong
      val sSum = rows.map(_._2).sum
      val ss = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      (p, n, sSum, ss, math.floor(sSum.toDouble * sSum.toDouble / n.toDouble / 10000.0).toLong)
    }.toSeq
    val k = g.size.toLong
    val nn = g.map(_._2).sum
    val stot = g.map(_._3).sum
    val tsum = g.map(_._5).sum
    val ssq = math.floor(g.map(_._4).sum.toDouble / 10000.0).toLong
    val grand = math.floor(stot.toDouble * stot.toDouble / nn.toDouble / 10000.0).toLong
    val (ssb, ssw, sst) = (tsum - grand, ssq - tsum, ssq - grand)
    val f = q6((ssb.toDouble / (k - 1)) / (ssw.toDouble / (nn - k)))
    val eta2 = q6(ssb.toDouble / sst.toDouble)
    val got = Registry.byName("q_stat_11_anova").fn(spark, sf).collect()
    assert(got.length == k)
    got.foreach { r =>
      val (_, n, sSum, _, _) = g.find(_._1 == r.getString(0)).get
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == math.floor(sSum.toDouble / n / 100 * 100 + 0.5) / 100)
      assert(r.getDouble(3) == f, s"f ${r.getDouble(3)} != $f")
      assert(r.getDouble(4) == eta2)
      assert(eta2 >= 0.0 && eta2 <= 1.0)
    }
  }

  test("q_stat_12_runs: order-statistic median, run count, and z replicate") {
    val days = Tables(spark, sf, "events")
      .selectExpr("unix_micros(ts) div 86400000000 AS day_id").collect()
      .map(_.getLong(0)).groupBy(identity).map { case (d, v) => (d, v.length.toLong) }
      .toSeq.sortBy(_._1)
    val n = days.length.toLong
    val med = days.map(_._2).sorted.apply((((n + 1) / 2) - 1).toInt)
    val signs = days.filter(_._2 != med).map(d => if (d._2 > med) 1 else 0)
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == 0).toLong
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    val mu2 = 2.0 * n1 * n2
    val z = if (n1 > 0 && n2 > 0 && 2 * n1 * n2 - n1 - n2 > 0)
      q6((runs - (mu2 / (n1 + n2) + 1)) /
        math.sqrt((2.0 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) /
          ((n1 + n2).toDouble * (n1 + n2).toDouble * (n1 + n2 - 1).toDouble)))
    else 0.0
    val got = Registry.byName("q_stat_12_runs").fn(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n && r.getLong(1) == med)
    assert(r.getLong(2) == n1 && r.getLong(3) == n2 && r.getLong(4) == runs)
    assert(r.getDouble(5) == z, s"z ${r.getDouble(5)} != $z")
  }

  test("q_dq_22_id_gaps: top-20 holes replicate and contain no existing key") {
    val ids = Tables(spark, sf, "events")
      .filter("event_type = 'purchase'")
      .select("event_id").collect().map(_.getLong(0)).distinct.sorted
    val gaps = ids.zip(ids.tail).collect {
      case (a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.sortBy(g => (-g._3, g._1)).take(20)
    val got = Registry.byName("q_dq_22_id_gaps").fn(spark, sf).collect()
    assert(got.length == gaps.length)
    val idSet = ids.toSet
    got.zip(gaps).foreach { case (r, (s0, e0, l0)) =>
      assert(r.getLong(0) == s0 && r.getLong(1) == e0 && r.getLong(2) == l0)
      assert(!(r.getLong(0) to r.getLong(1)).exists(idSet.contains))
    }
  }

  test("q_time_8_xcorr: lag-0 equals dense-series Pearson r; all lags replicate") {
    val ev = Tables(spark, sf, "events")
      .filter("event_type IN ('click','purchase')")
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS h").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byH = ev.groupBy(_._2).map { case (h, rows) =>
      h -> (rows.count(_._1 == "click").toLong, rows.count(_._1 == "purchase").toLong)
    }
    val (lo, hi) = (byH.keys.min, byH.keys.max)
    val dense = (lo to hi).map(h => byH.getOrElse(h, (0L, 0L)))
    def r(lag: Int): Double = {
      val pairs = dense.dropRight(lag).map(_._1).zip(dense.drop(lag).map(_._2))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum; val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      if (vx > 0 && vy > 0) q6((n * sxy - sx * sy).toDouble / math.sqrt(vx.toDouble * vy.toDouble))
      else 0.0
    }
    val got = Registry.byName("q_time_8_xcorr").fn(spark, sf).collect()
    assert(got.length == 7)
    got.foreach { row =>
      val lag = row.getLong(0).toInt
      assert(row.getLong(1) == dense.length - lag)
      assert(row.getDouble(2) == r(lag), s"lag $lag: ${row.getDouble(2)} != ${r(lag)}")
    }
  }
}
