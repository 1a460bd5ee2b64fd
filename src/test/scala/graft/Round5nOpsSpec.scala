package graft

/** Round-5n operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5m suites).
  */
class Round5nOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  private lazy val purchaseDaily: Seq[(Long, Long)] =
    events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (d0, rows) => d0 -> rows.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum }
      .toSeq.sortBy(_._1)

  test("q_time_14_pacf: Durbin-Levinson over quantized ACF replicates; pacf1 = r1") {
    val byDay = events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (d0, rows) => d0 -> rows.length.toLong }.toSeq.sortBy(_._1)
    val n = byDay.length.toLong
    val sx = byDay.map(_._2).sum
    val dev = byDay.map { case (d0, x) => d0 -> (n * x - sx) }.toMap
    val den = dev.values.map(v => v * v).sum
    def r6(k: Int): Long = {
      val num = dev.flatMap { case (d0, v) => dev.get(d0 - k).map(_ * v) }.sum
      math.floor(num.toDouble / den * 1e6 + 0.5).toLong
    }
    val (r1, r2, r3) = (r6(1) / 1e6, r6(2) / 1e6, r6(3) / 1e6)
    val phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val phi21 = r1 - phi22 * r1
    val pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    val row = Registry.byName("q_time_14_pacf").fn(spark, sf).collect().head
    assert(row.getDouble(0) == q6(r1))
    assert(row.getDouble(1) == q6(phi22))
    assert(row.getDouble(2) == q6(pacf3))
    // lag-1 PACF IS the lag-1 ACF by construction
    val acf = Registry.byName("q_time_12_ljungbox").fn(spark, sf) // just ensures family consistency compiles
    assert(acf != null)
  }

  test("q_win_18_robust_band: exact median/MAD element picks; flag integer-exact") {
    val expected = purchaseDaily.zipWithIndex.drop(6).map { case ((d0, c), i) =>
      val win = purchaseDaily.slice(i - 6, i + 1).map(_._2).sorted
      val med = win(3)
      val mad = win.map(v => math.abs(v - med)).sorted.apply(3)
      d0 -> (q2(c.toDouble / 100), q2(med.toDouble / 100), q2(mad.toDouble / 100),
        if (math.abs(c - med) > 2 * mad) 1L else 0L)
    }.toMap
    val got = Registry.byName("q_win_18_robust_band").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (v, med, mad, out) = expected(r.getLong(0))
      assert(r.getDouble(1) == v && r.getDouble(2) == med)
      assert(r.getDouble(3) == mad && r.getLong(4) == out, s"day ${r.getLong(0)}")
    }
  }

  test("q_sim_25_variance_explained: per-dim ANOVA decomposition replicates; in [0,1]") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val dims = vecs.head._2.length
    var sstot = BigInt(0); var corr = 0L; var btot = 0L
    (0 until dims).foreach { d0 =>
      val qs = vecs.map { case (l, v) => (l, math.floor(v(d0).toDouble * 1e6 + 0.5).toLong) }
      val s = qs.map(_._2).sum; val n = qs.length.toLong
      sstot += qs.map(q => BigInt(q._2) * BigInt(q._2)).sum
      corr += math.floor(s.toDouble * s / n + 0.5).toLong
      btot += qs.groupBy(_._1).map { case (_, rows) =>
        val sl = rows.map(_._2).sum
        math.floor(sl.toDouble * sl / rows.length + 0.5).toLong
      }.sum
    }
    val ve = q6((btot.toDouble - corr) / (sstot.toDouble - corr))
    val row = Registry.byName("q_sim_25_variance_explained").fn(spark, sf).collect().head
    assert(row.getLong(0) == dims.toLong)
    assert(row.getDouble(1) == ve)
    assert(ve >= 0.0 && ve <= 1.0)
  }

  test("q_text_44_ttr_curve: prefix TTRs replicate; curve declines with budget") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ", -1))
    val expected = Seq(10, 20, 40).map { b =>
      val eligible = docs.filter(_.length >= b)
      val ttrs = eligible.map(tk =>
        math.floor(tk.take(b).distinct.length.toDouble / b * 1e6 + 0.5).toLong)
      (b.toLong, eligible.length.toLong,
        math.floor(ttrs.sum.toDouble / ttrs.length + 0.5) / 1e6)
    }
    val got = Registry.byName("q_text_44_ttr_curve").fn(spark, sf).collect()
    assert(got.length == 3)
    got.zip(expected).foreach { case (r, (b, n, ttr)) =>
      assert(r.getLong(0) == b && r.getLong(1) == n && r.getDouble(2) == ttr)
    }
    assert(got.map(_.getDouble(2)).sameElements(got.map(_.getDouble(2)).sorted.reverse))
  }

  test("q_mm_8_silence_runs: per-doc low-energy islands replicate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 100").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val energies = (0 until 256).map { i =>
        val s = t.charAt(i % t.length).toInt - 128
        (i / 32, s.toLong * s)
      }.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).sum)
      val med = energies.sorted.apply(3)
      val low = energies.map(e => e < med)
      var longest = 0L; var cur = 0L; var runs = 0L; var prev = false
      low.foreach { l =>
        if (l) { cur += 1; longest = math.max(longest, cur); if (!prev) runs += 1 }
        else cur = 0
        prev = l
      }
      id -> (energies.length.toLong, low.count(identity).toLong, longest, runs)
    }.toMap
    val got = Registry.byName("q_mm_8_silence_runs").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nf, nl, lg, nr) = expected(r.getLong(0))
      assert(r.getLong(1) == nf && r.getLong(2) == nl)
      assert(r.getLong(3) == lg && r.getLong(4) == nr, s"doc ${r.getLong(0)}")
    }
  }

  test("q_scan_17_systematic: every-20th stable-order sample; small relative bias") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sample = orders.zipWithIndex.filter { case (_, i) => i % 20 == 0 }.map(_._1)
    val popMean = orders.map(_._2).sum.toDouble / orders.length
    val samMean = sample.map(_._2).sum.toDouble / sample.length
    val row = Registry.byName("q_scan_17_systematic").fn(spark, sf).collect().head
    assert(row.getLong(0) == orders.length.toLong && row.getLong(1) == sample.length.toLong)
    assert(row.getDouble(2) == q2(popMean / 100) && row.getDouble(3) == q2(samMean / 100))
    assert(row.getDouble(4) == q6((samMean - popMean) / popMean))
    assert(math.abs(row.getDouble(4)) < 0.2)
  }
}
