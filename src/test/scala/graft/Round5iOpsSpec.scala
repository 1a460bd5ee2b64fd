package graft

/** Round-5i operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5h suites).
  */
class Round5iOpsSpec extends SparkSpec {

  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  private lazy val purchaseDaily: Seq[(Long, Long)] =
    events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (day, rows) => day -> rows.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum }
      .toSeq.sortBy(_._1)

  test("q_ml_4_learning_curve: accuracy non-decreasing sanity; integer-core argmin replicates") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def h(id: Long, m: Long) = id % 1000000007L * m % 1000000007L
    val test = vecs.filter(v => h(v._1, 2654435761L) % 5 == 0)
    val pool = vecs.filter(v => h(v._1, 2654435761L) % 5 != 0)
    val expected = Seq(1, 2, 4).map { f =>
      val train = pool.filter(v => h(v._1, 1103515245L) % 4 < f)
      val cents = train.groupBy(_._2).map { case (label, rows) =>
        val dims = rows.head._3.length
        label -> (0 until dims).map { d0 =>
          (rows.map(r => math.floor(r._3(d0).toDouble * 1e6 + 0.5).toLong).sum, rows.length.toLong)
        }
      }
      val ok = test.count { case (_, actual, v) =>
        val best = cents.toSeq.map { case (label, cs) =>
          val dq = cs.zipWithIndex.map { case ((sa, na), d0) =>
            val diff = v(d0).toDouble - sa.toDouble / na / 1e6
            math.floor(diff * diff * 1e9 + 0.5).toLong
          }.sum
          (dq, label)
        }.min
        best._2 == actual
      }
      (f * 25L, train.length.toLong, test.length.toLong, ok.toLong,
        q6(ok.toDouble / test.length))
    }
    val got = Registry.byName("q_ml_4_learning_curve").fn(spark, sf).collect()
    assert(got.length == 3)
    got.zip(expected).foreach { case (r, (pct, nTrain, nTest, ok, acc)) =>
      assert(r.getLong(0) == pct && r.getLong(1) == nTrain)
      assert(r.getLong(2) == nTest && r.getLong(3) == ok, s"pct $pct")
      assert(r.getDouble(4) == acc)
    }
  }

  test("q_pipe_2_quality_funnel: stage counts nest; drops sum to total minus final") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val t = docs.map { case (id, text) =>
      val tk = text.split(" ", -1)
      (id, text, tk.length.toLong, tk.distinct.length.toLong)
    }
    val s1 = t.filter(r => r._3 >= 20 && r._3 <= 500)
    val s2 = s1.filter(r => (r._3 - r._4) * 5 <= 3 * r._3)
    val s3 = s2.groupBy(_._2.toLowerCase.trim).map(_._2.map(_._1).min).toSeq
    val s3set = s3.toSet
    val s4 = s2.filter(r => s3set(r._1))
      .groupBy(r => r._2.split(" ", -1).distinct.sorted.mkString(" "))
      .map(_._2.map(_._1).min).toSeq
    val expected = Seq(t.length, s1.length, s2.length, s3.length, s4.length).map(_.toLong)
    val got = Registry.byName("q_pipe_2_quality_funnel").fn(spark, sf).collect()
    assert(got.length == 5)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i && r.getLong(2) == expected(i), s"stage $i")
      assert(r.getDouble(3) == q6(expected(i).toDouble / expected.head))
      if (i > 0) assert(r.getLong(4) == expected(i - 1) - expected(i))
    }
    assert(expected == expected.sorted.reverse) // monotone funnel
  }

  test("q_win_15_streaks: longest sign islands replicate") {
    val diffs = purchaseDaily.sliding(2).map { case Seq((_, a), (_, b)) =>
      if (b > a) 1 else if (b < a) -1 else 0
    }.toSeq
    def longest(sgn: Int): Long = {
      var best = 0L; var cur = 0L
      diffs.foreach { s => if (s == sgn) { cur += 1; best = math.max(best, cur) } else cur = 0 }
      best
    }
    def nStreaks(sgn: Int): Long =
      diffs.zip(0 +: diffs.dropRight(1)).count { case (s, p) => s == sgn && p != sgn }.toLong
    val row = Registry.byName("q_win_15_streaks").fn(spark, sf).collect().head
    assert(row.getLong(0) == purchaseDaily.length.toLong)
    assert(row.getLong(1) == longest(1) && row.getLong(2) == longest(-1))
    assert(row.getLong(3) == nStreaks(1) && row.getLong(4) == nStreaks(-1))
  }

  test("q_stat_22_trend_test: Cochran-Armitage z replicates") {
    val byDay = events.groupBy(_._2 / 86400000000L).toSeq.sortBy(_._1)
      .map { case (_, rows) => (rows.length.toLong, rows.count(_._4 == "purchase").toLong) }
    val nn = byDay.map(_._1).sum; val kk = byDay.map(_._2).sum
    val sk = byDay.zipWithIndex.map { case ((_, k), i) => i.toLong * k }.sum
    val sn = byDay.zipWithIndex.map { case ((n, _), i) => i.toLong * n }.sum
    val ssn = byDay.zipWithIndex.map { case ((n, _), i) => i.toLong * i * n }.sum
    val p = kk.toDouble / nn
    val z = q6((sk.toDouble - p * sn)
      / math.sqrt(p * (1 - p) * (ssn.toDouble - sn.toDouble * sn / nn)))
    val row = Registry.byName("q_stat_22_trend_test").fn(spark, sf).collect().head
    assert(row.getLong(0) == byDay.length.toLong)
    assert(row.getLong(1) == nn && row.getLong(2) == kk)
    assert(row.getDouble(3) == z)
  }

  test("q_stream_22_concurrency: sweep-line max over rebuilt sessions") {
    val sessions = events.groupBy(_._3).values.flatMap { rows =>
      val ts = rows.map(_._2).toSeq.sorted
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head; var last = ts.head
      ts.tail.foreach { t =>
        if (t - last > 30L * 60 * 1000000) { buf += ((start, last)); start = t }
        last = t
      }
      buf += ((start, last))
      buf
    }.toSeq
    val pts = sessions.flatMap { case (st, en) => Seq((st, 1), (en + 1, -1)) }
      .sortBy(p => (p._1, p._2))
    var conc = 0L; var best = (Long.MinValue, 0L)
    pts.foreach { case (t, d0) =>
      conc += d0
      if (conc > best._2) best = (t, conc)
    }
    val row = Registry.byName("q_stream_22_concurrency").fn(spark, sf).collect().head
    assert(row.getLong(0) == sessions.length.toLong)
    assert(row.getLong(1) == best._2 && row.getLong(2) == best._1)
  }

  test("q_agg_37_ratio_ci: clustered delta-method interval replicates and brackets") {
    val perUser = events.groupBy(e => ((e._2 / 86400000000L + 4) % 7, e._3))
      .map { case ((dow, _), rows) =>
        val xu = rows.filter(_._4 == "purchase").map(r => math.floor(r._5 * 100 + 0.5).toLong).sum
        (dow, xu, rows.length.toLong)
      }.toSeq
    val expected = perUser.groupBy(_._1).map { case (dow, rows) =>
      val uu = rows.length.toLong
      val sx = rows.map(_._2).sum; val sn = rows.map(_._3).sum
      val sxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val sxn = rows.map(r => r._2 * r._3).sum
      val snn = rows.map(r => r._3 * r._3).sum
      val r0 = sx.toDouble / sn
      val se = math.sqrt((sxx.toDouble - 2 * r0 * sxn + r0 * r0 * snn) * uu / (uu - 1)) / sn
      dow -> (uu, q4(r0 / 100), q4(se / 100),
        q4((r0 - 1.959964 * se) / 100), q4((r0 + 1.959964 * se) / 100))
    }
    val got = Registry.byName("q_agg_37_ratio_ci").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (uu, ratio, se, lo, hi) = expected(r.getLong(0))
      assert(r.getLong(1) == uu && r.getDouble(2) == ratio)
      assert(r.getDouble(3) == se && r.getDouble(4) == lo && r.getDouble(5) == hi)
      assert(lo <= ratio && ratio <= hi)
    }
  }

  test("q_sink_3_manifest: written-partition stats equal source-side stats") {
    val got = Registry.byName("q_sink_3_manifest").fn(spark, sf).collect()
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS month",
        "o_orderkey", "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.length == src.size)
    got.foreach { r =>
      val rows = src(r.getString(0))
      assert(r.getLong(1) == rows.length.toLong)
      assert(r.getLong(2) == rows.map(_._2).min && r.getLong(3) == rows.map(_._2).max)
      assert(r.getLong(4) == rows.map(_._3).sum)
    }
  }
}
