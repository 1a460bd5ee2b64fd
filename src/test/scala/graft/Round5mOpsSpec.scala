package graft

/** Round-5m operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5l suites).
  */
class Round5mOpsSpec extends SparkSpec {

  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))

  test("q_sub_4_quantified: ALL reduces to max, ANY to min; above_all <= above_any") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderpriority", "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val avgs = orders.groupBy(_._1).map { case (_, rows) =>
      rows.map(_._2).sum.toDouble / rows.length
    }
    val (mx, mn) = (avgs.max, avgs.min)
    val row = Registry.byName("q_sub_4_quantified").fn(spark, sf).collect().head
    assert(row.getLong(0) == orders.length.toLong)
    assert(row.getLong(1) == orders.count(_._2 > mx).toLong)
    assert(row.getLong(2) == orders.count(_._2 > mn).toLong)
    assert(row.getLong(1) <= row.getLong(2))
  }

  test("q_dedup_18_canonical_pick: longest-doc vs min-id disagreement replicates") {
    val clusters = docs.groupBy(_._2.split(" ", -1).distinct.sorted.mkString(" ")).values
    val multi = clusters.filter(_.length > 1)
    val differs = multi.count { rows =>
      val minId = rows.map(_._1).min
      val best = rows.map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
        .minBy(r => (-r._2, r._1))._1
      best != minId
    }
    val row = Registry.byName("q_dedup_18_canonical_pick").fn(spark, sf).collect().head
    assert(row.getLong(0) == clusters.size.toLong)
    assert(row.getLong(1) == multi.size.toLong)
    assert(row.getLong(2) == differs.toLong)
    assert(row.getDouble(3) == q6(differs.toDouble / multi.size))
  }

  test("q_set_6_policy_diff: survivor-set algebra; only_exact + both = exact total") {
    val exact = docs.groupBy(_._2.toLowerCase.trim).map(_._2.map(_._1).min).toSet
    val near = docs.groupBy(_._2.split(" ", -1).distinct.sorted.mkString(" "))
      .map(_._2.map(_._1).min).toSet
    val row = Registry.byName("q_set_6_policy_diff").fn(spark, sf).collect().head
    assert(row.getLong(0) == (exact -- near).size.toLong)
    assert(row.getLong(1) == (near -- exact).size.toLong)
    assert(row.getLong(2) == (exact & near).size.toLong)
    assert(row.getLong(3) == ((exact | near).size - (exact & near).size).toLong)
    assert(row.getLong(0) + row.getLong(2) == exact.size.toLong)
  }

  test("q_stream_26_volume_trend: per-type OLS slope replicates; flag = sign(cov)") {
    val expected = events.groupBy(_._4).map { case (tp, rows) =>
      val byDay = rows.groupBy(_._2 / 86400000000L).toSeq.sortBy(_._1)
        .map(_._2.length.toLong)
      val n = byDay.length.toLong
      val xy = byDay.zipWithIndex.map { case (y, i) => (i.toLong, y) }
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val cov = n.toDouble * sxy - sx.toDouble * sy
      val vx = n.toDouble * sxx - sx.toDouble * sx
      tp -> (n, q4(cov / vx), if (cov < 0) 1L else 0L)
    }
    val got = Registry.byName("q_stream_26_volume_trend").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, slope, flag) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == slope && r.getLong(3) == flag)
    }
  }

  test("q_ml_7_dim_screening: point-biserial argsort replicates; |rpb| <= 1") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val dims = vecs.head._2.length
    val rpbs = (0 until dims).map { d0 =>
      val qs = vecs.map { case (l, v) =>
        (if (l == 0) 1 else 0, math.floor(v(d0).toDouble * 1e6 + 0.5).toLong)
      }
      val n1 = qs.count(_._1 == 1).toLong; val s1 = qs.filter(_._1 == 1).map(_._2).sum
      val n0 = qs.count(_._1 == 0).toLong; val s0 = qs.filter(_._1 == 0).map(_._2).sum
      val n = qs.length.toLong; val ssum = qs.map(_._2).sum
      val ss = qs.map(q => BigInt(q._2) * BigInt(q._2)).sum
      val rpb = (s1.toDouble / n1 - s0.toDouble / n0) *
        math.sqrt(n1.toDouble * n0 / (n.toDouble * n)) /
        math.sqrt((ss.toDouble - ssum.toDouble * ssum / n) / n)
      (d0.toLong, rpb)
    }
    val top = rpbs.sortBy(r => (-math.abs(r._2), r._1)).take(10)
    val got = Registry.byName("q_ml_7_dim_screening").fn(spark, sf).collect()
    assert(got.length == 10)
    got.zip(top).zipWithIndex.foreach { case ((r, (d0, rpb)), i) =>
      assert(r.getLong(0) == i + 1 && r.getLong(1) == d0)
      assert(r.getDouble(2) == q6(rpb))
      assert(math.abs(r.getDouble(2)) <= 1.0)
    }
  }

  test("q_proj_8_try_arith: overflow guard matches try_multiply semantics") {
    val cents = events.map(e => math.floor(e._5 * 100 + 0.5).toLong)
    val lim = Long.MaxValue / 1000000007L
    val expected = cents.map { c =>
      val scaled = c * 1000000007L
      if (math.abs(scaled) > lim) None else Some(scaled * 1000000007L)
    }
    val row = Registry.byName("q_proj_8_try_arith").fn(spark, sf).collect().head
    assert(row.getLong(0) == cents.length.toLong)
    assert(row.getLong(1) == expected.count(_.isEmpty).toLong)
    assert(row.getLong(2) == expected.flatten.max)
  }

  test("q_json_5_props_stats: typed extraction sums replicate") {
    val expected = events.groupBy(_._4).map { case (tp, rows) =>
      val ks = rows.map(r => """"k":\s*(\d+)""".r.findFirstMatchIn(r._6).get.group(1).toLong)
      tp -> (ks.length.toLong, ks.sum, ks.min, ks.max, q4(ks.sum.toDouble / ks.length))
    }
    val got = Registry.byName("q_json_5_props_stats").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, s, mn, mx, mean) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == s)
      assert(r.getLong(3) == mn && r.getLong(4) == mx && r.getDouble(5) == mean)
    }
  }
}
