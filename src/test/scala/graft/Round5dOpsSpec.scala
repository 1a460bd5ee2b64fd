package graft

/** Round-5d operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5c suites).
  */
class Round5dOpsSpec extends SparkSpec {

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
      .select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))

  test("q_stream_17_attribution: last non-purchase touch credited, none-bucket kept") {
    // per user, walk the (ts, event_id)-ordered stream carrying the last
    // non-purchase touch; credit each purchase to it
    val credits = events.groupBy(_._3).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      var lastType: Option[String] = None
      var lastUs: Option[Long] = None
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Option[Long])]
      sorted.foreach { r =>
        if (r._4 == "purchase") out += ((lastType.getOrElse("none"), lastUs.map(r._2 - _)))
        else { lastType = Some(r._4); lastUs = Some(r._2) }
      }
      out
    }.toSeq
    val tot = credits.length.toLong
    val expected = credits.groupBy(_._1).map { case (ch, rows) =>
      val n = rows.length.toLong
      val gaps = rows.flatMap(_._2)
      val mean = if (gaps.nonEmpty) q2(gaps.sum.toDouble / gaps.length / 60000000L) else 0.0
      ch -> (n, q6(n.toDouble / tot), mean)
    }
    val got = Registry.byName("q_stream_17_attribution").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, share, mean) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == share && r.getDouble(3) == mean,
        s"${r.getString(0)}: ${(r.getDouble(2), r.getDouble(3))} != ${(share, mean)}")
    }
    assert(expected.values.map(_._1).sum == events.count(_._4 == "purchase"))
  }

  test("q_stat_17_cramers_v: quantized cell terms sum to chi2; V in [0,1]") {
    val cells = orders.groupBy(o => (o._3, o._2)).map { case (k, rows) => k -> rows.length.toLong }
    val ra = cells.groupBy(_._1._1).map { case (a, cs) => a -> cs.values.sum }
    val cb = cells.groupBy(_._1._2).map { case (b, cs) => b -> cs.values.sum }
    val n = orders.length.toLong
    val chiq = cells.map { case ((a, b), o) =>
      val e = ra(a).toDouble * cb(b).toDouble / n.toDouble
      math.floor((o.toDouble - e) * (o.toDouble - e) / e * 1e9 + 0.5).toLong
    }.sum
    val r = ra.size.toLong
    val c = cb.size.toLong
    val chi2 = q6(chiq.toDouble / 1e9)
    val v = q6(math.sqrt(chiq.toDouble / 1e9 / (n.toDouble * math.min(r - 1, c - 1))))
    val row = Registry.byName("q_stat_17_cramers_v").fn(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == r && row.getLong(2) == c)
    assert(row.getDouble(3) == chi2 && row.getDouble(4) == v)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_agg_33_theil: exact x·lnq statistics; T >= 0 and 0 for a constant group") {
    val expected = orders.groupBy(_._2).map { case (prio, rows) =>
      val nn = rows.length.toLong
      val sx = rows.map(_._4).sum
      val sxl = rows.map { o =>
        BigInt(o._4) * BigInt(math.floor(math.log(o._4.toDouble) * 1e9 + 0.5).toLong)
      }.sum
      val t = q6(sxl.toDouble / 1e9 / sx.toDouble - math.log(sx.toDouble / nn.toDouble))
      prio -> (nn, q2(sx.toDouble / nn / 100), t)
    }
    val got = Registry.byName("q_agg_33_theil").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nn, mean, t) = expected(r.getString(0))
      assert(r.getLong(1) == nn)
      assert(r.getDouble(2) == mean && r.getDouble(3) == t,
        s"${r.getString(0)}: ${(r.getDouble(2), r.getDouble(3))} != ${(mean, t)}")
      // Theil T is nonnegative up to the 1e-9 ln quantization
      assert(r.getDouble(3) >= -1e-6)
    }
  }

  test("q_time_10_changepoint: integer argmax over all splits replicates") {
    val byDay = events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (day, rows) => day -> rows.length.toLong }.toSeq.sortBy(_._1)
    val n = byDay.length.toLong
    val s = byDay.map(_._2).sum
    var s1 = 0L
    val gains = byDay.zipWithIndex.dropRight(1).map { case ((day, cnt), i) =>
      s1 += cnt
      val k = i + 1L
      val g = s1 * s1 * 1000000L / k + (s - s1) * (s - s1) * 1000000L / (n - k) - s * s * 1000000L / n
      (day, k, s1, g)
    }
    val best = gains.minBy { case (day, _, _, g) => (-g, day) }
    val row = Registry.byName("q_time_10_changepoint").fn(spark, sf).collect().head
    assert(row.getLong(0) == best._1 && row.getLong(1) == n && row.getLong(2) == best._2)
    assert(row.getDouble(3) == q2(best._3.toDouble / best._2))
    assert(row.getDouble(4) == q2((s - best._3).toDouble / (n - best._2)))
    assert(row.getDouble(5) == q2(best._4.toDouble / 1e6))
    assert(row.getDouble(5) >= -0.01) // between-SSE gain can't be negative beyond floor-div noise
  }

  test("q_sim_19_eff_dim: participation ratio replicates in float-then-double folds") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Float](2).toArray))
    val per = vecs.map { case (id, label, v) =>
      val n2 = v.foldLeft(0.0)((acc, x) => acc + (x * x).toDouble)
      val n4 = v.foldLeft(0.0)((acc, x) => { val sq = (x * x).toDouble; acc + sq * sq })
      (id, label, math.floor(n2 * n2 / n4 * 1e6 + 0.5).toLong)
    }
    val expected = per.groupBy(_._2).map { case (label, rows) =>
      val nn = rows.length.toLong
      val sorted = rows.sortBy(r => (r._3, r._1)).map(_._3)
      label -> (nn, math.floor(rows.map(_._3).sum.toDouble / nn + 0.5) / 1e6,
        sorted((nn.toInt + 1) / 2 - 1).toDouble / 1e6,
        sorted.head.toDouble / 1e6, sorted.last.toDouble / 1e6)
    }
    val got = Registry.byName("q_sim_19_eff_dim").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nn, mean, p50, mn, mx) = expected(r.getLong(0))
      assert(r.getLong(1) == nn)
      assert(r.getDouble(2) == mean && r.getDouble(3) == p50)
      assert(r.getDouble(4) == mn && r.getDouble(5) == mx)
      // unit vectors in 64 dims: 1 <= eff_dim <= 64
      assert(mn >= 1.0 - 1e-6 && mx <= 64.0 + 1e-6)
    }
  }

  test("q_text_35_heaps: log-log OLS replicates; beta in (0,1] for real text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("text").collect()
      .map(_.getString(0).split(" ", -1))
      .map(tk => (tk.length.toLong, tk.distinct.length.toLong))
      .filter(t => t._1 > 0 && t._2 > 0)
    val xy = docs.map { case (nt, nu) =>
      (math.floor(math.log(nt.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(nu.toDouble) * 1e6 + 0.5).toLong)
    }
    val n = xy.length.toLong
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val cov = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val varx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    val vary = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
    val beta = q6(cov / varx)
    val k = q4(math.exp((sy.toDouble - cov / varx * sx.toDouble) / n.toDouble / 1e6))
    val r2 = q6(cov * cov / (varx * vary))
    val row = Registry.byName("q_text_35_heaps").fn(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == beta && row.getDouble(2) == k && row.getDouble(3) == r2,
      s"${(row.getDouble(1), row.getDouble(2), row.getDouble(3))} != ${(beta, k, r2)}")
    assert(beta > 0.0 && beta <= 1.0 && r2 > 0.0 && r2 <= 1.0)
  }

  test("q_stream_18_power_users: top ceil(1%) by (count desc, id) and their share") {
    val byUser = events.groupBy(_._3).map { case (u, rows) => (u, rows.length.toLong) }.toSeq
    val nu = byUser.length.toLong
    val tot = byUser.map(_._2).sum
    val top = byUser.sortBy(r => (-r._2, r._1)).take(((nu + 99) / 100).toInt)
    val row = Registry.byName("q_stream_18_power_users").fn(spark, sf).collect().head
    assert(row.getLong(0) == nu && row.getLong(1) == top.length.toLong)
    assert(row.getLong(2) == top.map(_._2).sum && row.getLong(3) == tot)
    assert(row.getDouble(4) == q6(top.map(_._2).sum.toDouble / tot))
    assert(row.getLong(5) == top.map(_._2).min)
  }
}
