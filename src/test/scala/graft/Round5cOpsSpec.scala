package graft

/** Round-5c operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5b suites).
  */
class Round5cOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  private lazy val orders =
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))

  test("q_stat_15_levene: Brown-Forsythe = ANOVA machinery on |x - group median|") {
    val byPrio = orders.groupBy(_._2)
    val med = byPrio.map { case (p, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1)).map(_._3)
      p -> sorted((sorted.length + 1) / 2 - 1)
    }
    val devs = orders.map(o => (o._2, math.abs(o._3 - med(o._2))))
    val g = devs.groupBy(_._1).map { case (p, rows) =>
      val n = rows.length.toLong
      val sdev = rows.map(_._2).sum
      val ss = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val t = math.floor(sdev.toDouble * sdev.toDouble / n.toDouble / 10000.0).toLong
      p -> (n, sdev, ss, t)
    }
    val k = g.size.toLong
    val nn = g.values.map(_._1).sum
    val stot = g.values.map(_._2).sum
    val tsum = g.values.map(_._4).sum
    val ssq = math.floor(g.values.map(_._3).sum.toDouble / 10000.0).toLong
    val grand = math.floor(stot.toDouble * stot.toDouble / nn.toDouble / 10000.0).toLong
    val ssb = tsum - grand
    val ssw = ssq - tsum
    val w = q6((ssb.toDouble / (k - 1).toDouble) / (ssw.toDouble / (nn - k).toDouble))
    val got = Registry.byName("q_stat_15_levene").fn(spark, sf).collect()
    assert(got.length == g.size)
    got.foreach { r =>
      val (n, sdev, _, _) = g(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == q2(med(r.getString(0)).toDouble / 100))
      assert(r.getDouble(3) == q2(sdev.toDouble / n.toDouble / 100))
      assert(r.getDouble(4) == w, s"w ${r.getDouble(4)} != $w")
    }
    assert(w >= 0.0)
  }

  test("q_stat_16_wilson: interval replicates, brackets the rate, stays in [0,1]") {
    val z = 1.959964
    val g = events.groupBy(e => (e._2 / 86400000000L + 4) % 7).map { case (dow, rows) =>
      val n = rows.length.toLong
      val k = rows.count(_._4 == "purchase").toLong
      val p = k.toDouble / n
      val center = p + z * z / (2 * n)
      val half = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
      val denom = 1 + z * z / n
      dow -> (n, k, q6(p), q6((center - half) / denom), q6((center + half) / denom))
    }
    val got = Registry.byName("q_stat_16_wilson").fn(spark, sf).collect()
    assert(got.length == g.size)
    got.foreach { r =>
      val (n, k, rate, lo, hi) = g(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == k)
      assert(r.getDouble(3) == rate && r.getDouble(4) == lo && r.getDouble(5) == hi,
        s"dow ${r.getLong(0)}: ${(r.getDouble(3), r.getDouble(4), r.getDouble(5))} != ${(rate, lo, hi)}")
      assert(lo >= 0.0 && hi <= 1.0 && lo <= rate && rate <= hi)
    }
  }

  test("q_dq_24_ship_lag: per-month lag stats replicate; violations = negative lags") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_linenumber",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS LONG) AS sday")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val om = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS LONG) AS oday",
        "date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS month")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .map(r => r._1 -> (r._2, r._3)).toMap
    val j = li.map { case (ok, ln, sday) =>
      val (oday, month) = om(ok)
      (month, ok, ln, sday - oday)
    }
    val expected = j.groupBy(_._1).map { case (m, rows) =>
      val n = rows.length.toLong
      val lags = rows.map(_._4)
      val sorted = rows.sortBy(r => (r._4, r._2, r._3)).map(_._4)
      m -> (n, lags.count(_ < 0).toLong, sorted((n.toInt + 1) / 2 - 1),
        q2(lags.sum.toDouble / n), lags.max)
    }
    val got = Registry.byName("q_dq_24_ship_lag").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val month = r.getAs[Any](0).toString.substring(0, 7) // NTZ-or-TS tolerant
      val (n, viol, p50, mean, mx) = expected(month)
      assert(r.getLong(1) == n && r.getLong(2) == viol)
      assert(r.getLong(3) == p50 && r.getDouble(4) == mean && r.getLong(5) == mx,
        s"$month: ${(r.getLong(3), r.getDouble(4), r.getLong(5))} != ${(p50, mean, mx)}")
    }
  }

  test("q_stream_16_session_profile: exact order statistics over rebuilt sessions") {
    // rebuild 30-min-gap sessions (strictly-greater break, the
    // session_window merge rule) per user
    val sessions = events.groupBy(_._3).values.flatMap { rows =>
      val ts = rows.map(_._2).toSeq.sorted
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var cur = scala.collection.mutable.ArrayBuffer(ts.head)
      ts.tail.foreach { t =>
        if (t - cur.last > 30L * 60 * 1000000) { buf += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(t) }
        else cur += t
      }
      buf += cur.toSeq
      buf.map(sess => (sess.length.toLong, sess.max - sess.min))
    }.toSeq
    val n = sessions.length.toLong
    def orderStat(vs: Seq[Long], k: Long): Long = vs.sorted.apply(k.toInt - 1)
    val p50e = orderStat(sessions.map(_._1), (n + 1) / 2)
    val p90e = orderStat(sessions.map(_._1), (9 * n + 9) / 10)
    val p50s = orderStat(sessions.map(_._2), (n + 1) / 2)
    val p90s = orderStat(sessions.map(_._2), (9 * n + 9) / 10)
    val single = q6(sessions.count(_._1 == 1).toDouble / n)
    val got = Registry.byName("q_stream_16_session_profile").fn(spark, sf).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == n, s"${r.getLong(0)} != $n")
    assert(r.getLong(1) == p50e && r.getLong(2) == p90e)
    assert(r.getLong(3) == p50s && r.getLong(4) == p90s,
      s"(${r.getLong(3)}, ${r.getLong(4)}) != ($p50s, $p90s)")
    assert(r.getDouble(5) == single)
  }

  test("q_dedup_12_incremental: delta flags replicate against set-membership") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def isNew(id: Long): Boolean = id % 1000000007L * 2654435761L % 1000000007L % 10 == 0
    def ek(t: String): String = t.toLowerCase.trim
    def nk(t: String): String = t.split(" ").distinct.sorted.mkString(" ")
    val base = docs.filterNot(d => isNew(d._1))
    val baseEk = base.map(d => ek(d._3)).toSet
    val baseNk = base.map(d => nk(d._3)).toSet
    val expected = docs.filter(d => isNew(d._1)).groupBy(_._2).map { case (l, g) =>
      val x = g.count(d => baseEk(ek(d._3))).toLong
      val y = g.count(d => baseNk(nk(d._3))).toLong
      val any = g.count(d => baseEk(ek(d._3)) || baseNk(nk(d._3))).toLong
      l -> (g.length.toLong, x, y, q6(any.toDouble / g.length))
    }
    val got = Registry.byName("q_dedup_12_incremental").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nNew, x, y, share) = expected(r.getString(0))
      assert(r.getLong(1) == nNew && r.getLong(2) == x && r.getLong(3) == y,
        s"${r.getString(0)}: ${(r.getLong(1), r.getLong(2), r.getLong(3))} != ${(nNew, x, y)}")
      assert(r.getDouble(4) == share)
    }
    // the delta split is ~10% of the corpus
    val totalNew = expected.values.map(_._1).sum
    assert(totalNew > 0 && totalNew < docs.length / 5)
  }

  test("q_ml_3_nb_confusion: per-class P/R/F1 consistent with q_ml_2 counts") {
    val acc = Registry.byName("q_ml_2_nbayes").fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = Registry.byName("q_ml_3_nb_confusion").fn(spark, sf).collect()
    assert(got.length == acc.size)
    var predSum = 0L
    got.foreach { r =>
      val (nActual, tp) = acc(r.getString(0))
      assert(r.getLong(1) == nActual, "n_actual must match q_ml_2 n_docs")
      assert(r.getLong(3) == tp, "tp must match q_ml_2 n_correct")
      val (np, recall, f1) = (r.getLong(2), r.getDouble(5), r.getDouble(6))
      assert(recall == q6(tp.toDouble / nActual))
      if (np > 0) assert(r.getDouble(4) == q6(tp.toDouble / np))
      assert(f1 == q6(2.0 * tp / (nActual + np)))
      predSum += np
    }
    assert(predSum == acc.values.map(_._1).sum, "every doc predicted exactly once")
  }

  test("q_ret_6_reliability: decile stats replicate; deciles partition the stream") {
    val sorted = events.map(e => (math.floor(e._5 * 100 + 0.5).toLong,
      if (e._4 == "purchase") 1L else 0L, e._1)).sortBy(e => (e._1, e._3))
    val n = sorted.length
    // ntile(10): first (n mod 10) buckets get ceil(n/10), rest floor(n/10)
    val base = n / 10; val extra = n % 10
    val expected = (1 to 10).map { dec =>
      val start = (dec - 1) * base + math.min(dec - 1, extra)
      val len = base + (if (dec <= extra) 1 else 0)
      val rows = sorted.slice(start, start + len)
      val k = rows.map(_._2).sum
      val sc = rows.map(_._1).sum
      (dec.toLong, len.toLong, k, q4(sc.toDouble / len / 100), q6(k.toDouble / len))
    }
    val got = Registry.byName("q_ret_6_reliability").fn(spark, sf).collect()
    assert(got.length == 10)
    got.zip(expected).foreach { case (r, (dec, len, k, avg, rate)) =>
      assert(r.getLong(0) == dec && r.getLong(1) == len && r.getLong(2) == k,
        s"decile $dec: ${(r.getLong(1), r.getLong(2))} != ${(len, k)}")
      assert(r.getDouble(3) == avg && r.getDouble(4) == rate)
    }
  }
}
