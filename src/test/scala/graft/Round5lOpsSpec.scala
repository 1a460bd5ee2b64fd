package graft

/** Round-5l operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5k suites).
  */
class Round5lOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  private def dailyCents(tp: String): Seq[(Long, Long)] =
    events.filter(_._4 == tp).groupBy(_._2 / 86400000000L)
      .map { case (d0, rows) => d0 -> rows.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum }
      .toSeq.sortBy(_._1)

  test("q_stat_23_sign_test: binomial z over daily win bits replicates") {
    val byDay = events.groupBy(_._2 / 86400000000L).map { case (d0, rows) =>
      (rows.filter(_._4 == "purchase").map(r => math.floor(r._5 * 100 + 0.5).toLong).sum,
        rows.filter(_._4 == "click").map(r => math.floor(r._5 * 100 + 0.5).toLong).sum)
    }.toSeq
    val n = byDay.length.toLong
    val wins = byDay.count { case (p, c) => p > c }.toLong
    val ties = byDay.count { case (p, c) => p == c }.toLong
    val m = (n - ties).toDouble
    val z = q6((wins - m / 2) / math.sqrt(m / 4))
    val row = Registry.byName("q_stat_23_sign_test").fn(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == wins && row.getLong(2) == ties)
    assert(row.getDouble(3) == z)
  }

  test("q_ret_8_kendall_w: rank-sum concordance replicates; W in [1/3, 1]-ish band") {
    val u = events.groupBy(_._3).map { case (uid, rows) =>
      (uid, rows.length.toLong,
        rows.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum,
        rows.count(_._4 == "purchase").toLong)
    }.toSeq
    val r1 = u.sortBy(r => (-r._3, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val r2 = u.sortBy(r => (-r._2, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val r3 = u.sortBy(r => (-r._4, r._1)).zipWithIndex.map { case (r, i) => r._1 -> (i + 1L) }.toMap
    val n = u.length.toLong
    val sums = u.map(r => r1(r._1) + r2(r._1) + r3(r._1))
    val ssq = sums.map(s => s * s).sum
    val s = sums.sum
    val w = q6(12.0 * (ssq.toDouble - s.toDouble * s / n) / (9.0 * (n.toDouble * n * n - n)))
    val row = Registry.byName("q_ret_8_kendall_w").fn(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getDouble(1) == w)
    assert(w >= 0.0 && w <= 1.0 + 1e-9)
  }

  test("q_sim_24_ivf_balance: cell sizes partition the corpus; imbalance >= 1") {
    val row = Registry.byName("q_sim_24_ivf_balance").fn(spark, sf).collect().head
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(row.getLong(0) == 8L && row.getLong(1) == nVecs)
    assert(row.getLong(2) <= row.getLong(3))
    assert(row.getDouble(4) >= 1.0)
    assert(row.getDouble(4) == q4(row.getLong(3).toDouble / (nVecs.toDouble / 8)))
  }

  test("q_time_13_harmonic: Fourier projections replicate; amplitude = hypot(a, b)") {
    val byDay = events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (d0, rows) => d0 -> rows.length.toLong }.toSeq.sortBy(_._1)
    val n = byDay.length.toLong
    val sx = byDay.map(_._2).sum
    def c9(d0: Long) = math.floor(math.cos(2 * math.Pi * (d0 % 7) / 7) * 1e9 + 0.5).toLong
    def s9(d0: Long) = math.floor(math.sin(2 * math.Pi * (d0 % 7) / 7) * 1e9 + 0.5).toLong
    val sc = byDay.map(r => c9(r._1)).sum; val ss = byDay.map(r => s9(r._1)).sum
    val sxc = byDay.map(r => r._2 * c9(r._1)).sum; val sxs = byDay.map(r => r._2 * s9(r._1)).sum
    val a = 2 * (sxc.toDouble - sx.toDouble * sc / n) / n / 1e9
    val b = 2 * (sxs.toDouble - sx.toDouble * ss / n) / n / 1e9
    val row = Registry.byName("q_time_13_harmonic").fn(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == q2(sx.toDouble / n))
    assert(row.getDouble(2) == q4(a) && row.getDouble(3) == q4(b))
    assert(row.getDouble(4) == q4(math.sqrt(a * a + b * b)))
    assert(row.getDouble(5) == q4(math.atan2(b, a)))
  }

  test("q_ml_6_lift_chart: prefix gains replicate; lift decreasing to 1") {
    val sorted = events.map(e => (math.floor(e._5 * 100 + 0.5).toLong, e._1,
      if (e._4 == "purchase") 1L else 0L)).sortBy(r => (-r._1, r._2))
    val n = sorted.length
    val base = n / 10; val extra = n % 10
    val sizes = (1 to 10).map(i => if (i <= extra) base + 1 else base)
    val offsets = sizes.scanLeft(0)(_ + _)
    val ks = (1 to 10).map(i => sorted.slice(offsets(i - 1), offsets(i)).map(_._3).sum)
    val tn = n.toLong; val tk = ks.sum
    val got = Registry.byName("q_ml_6_lift_chart").fn(spark, sf).collect()
    assert(got.length == 10)
    var cn = 0L; var ck = 0L
    got.zipWithIndex.foreach { case (r, i) =>
      cn += sizes(i); ck += ks(i)
      assert(r.getLong(1) == sizes(i).toLong && r.getLong(2) == ks(i))
      assert(r.getDouble(3) == q6(ck.toDouble / tk))
      assert(r.getDouble(4) == q6(cn.toDouble / tn))
      assert(r.getDouble(5) == q4((ck.toDouble / tk) / (cn.toDouble / tn)))
      // NB: cumulative lift is NOT asserted monotone — a weak ranker
      // (this fixture's score barely ranks purchases) can dip below 1
      // mid-curve and recover; full depth always lands at exactly 1.
    }
    assert(math.abs(got.last.getDouble(5) - 1.0) < 1e-3)
  }

  test("q_stream_25_forecast_baseline: lag-1 and lag-7 MAE replicate") {
    val daily = dailyCents("purchase")
    val byDay = daily.toMap
    val rows = daily.filter { case (d0, _) =>
      byDay.contains(d0 - 1) && byDay.contains(d0 - 7)
    }
    // NB: the query uses ROW lags over observed days; with a dense daily
    // series row-lag == calendar-lag (fixture has no gaps — assert that)
    val days = daily.map(_._1)
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
    val s1 = rows.map { case (d0, c) => math.abs(c - byDay(d0 - 1)) }.sum
    val s7 = rows.map { case (d0, c) => math.abs(c - byDay(d0 - 7)) }.sum
    val row = Registry.byName("q_stream_25_forecast_baseline").fn(spark, sf).collect().head
    assert(row.getLong(0) == rows.length.toLong)
    assert(row.getDouble(1) == q2(s1.toDouble / rows.length / 100))
    assert(row.getDouble(2) == q2(s7.toDouble / rows.length / 100))
    assert(row.getDouble(3) == q6(s7.toDouble / s1))
    assert(row.getLong(4) == (if (s7 < s1) 1L else 0L))
  }

  test("q_win_17_rolling_skew: whole-dollar raw-moment identity replicates") {
    val daily = dailyCents("purchase").map { case (d0, c) => (d0, c / 100) }
    val expected = daily.zipWithIndex.drop(6).map { case ((d0, _), i) =>
      val win = daily.slice(i - 6, i + 1).map(_._2)
      val k = 7.0
      val m1 = win.sum / k
      val m2 = win.map(x => x * x).sum / k
      val m3 = win.map(x => x * x * x).sum / k
      d0 -> q6((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / math.pow(m2 - m1 * m1, 1.5))
    }.toMap
    val got = Registry.byName("q_win_17_rolling_skew").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(r.getDouble(2) == expected(r.getLong(0)), s"day ${r.getLong(0)}")
    }
  }
}
