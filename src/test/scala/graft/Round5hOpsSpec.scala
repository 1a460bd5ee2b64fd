package graft

/** Round-5h operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5g suites).
  */
class Round5hOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private val P = 1000000007L

  private def charHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("q_agg_36_quartile_shape: exact lower quartiles; Bowley in [-1, 1]") {
    val xs = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(r => (r._2, r._1)).map(_._2)
    val n = xs.length.toLong
    val (p25, p50, p75) = (xs(((n + 3) / 4).toInt - 1), xs(((n + 1) / 2).toInt - 1),
      xs(((3 * n + 3) / 4).toInt - 1))
    val row = Registry.byName("q_agg_36_quartile_shape").fn(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == q2(p25.toDouble / 100) && row.getDouble(2) == q2(p50.toDouble / 100))
    assert(row.getDouble(3) == q2(p75.toDouble / 100))
    assert(row.getDouble(4) == q2((p75 - p25).toDouble / 100))
    assert(row.getDouble(5) == q2((p25 + p75).toDouble / 2 / 100))
    val bowley = q6((p25 + p75 - 2 * p50).toDouble / (p75 - p25).toDouble)
    assert(row.getDouble(6) == bowley)
    assert(bowley >= -1.0 && bowley <= 1.0)
  }

  test("q_dq_26_volume_wow: lag-compare replicates; partial boundary week excluded") {
    val byWeek = events.groupBy(e => (e._4, e._2 / 604800000000L))
      .map { case (k, rows) => k -> rows.length.toLong }
    val w0 = byWeek.keys.map(_._2).min
    val expected = byWeek.flatMap { case ((tp, wk), n) =>
      byWeek.get((tp, wk - 1)).collect {
        case prev if wk > w0 + 1 =>
          (tp, wk) -> (n, prev, q6((n.toDouble - prev) / prev),
            if (n.toDouble < 0.8 * prev) 1L else 0L)
      }
    }
    val got = Registry.byName("q_dq_26_volume_wow").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, prev, chg, alert) = expected((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == prev)
      assert(r.getDouble(4) == chg && r.getLong(5) == alert)
    }
  }

  test("q_ret_7_topk_overlap: set overlap of the two deterministic top-50s") {
    val u = events.groupBy(_._3).map { case (uid, rows) =>
      (uid, rows.length.toLong, rows.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum)
    }.toSeq
    val tv = u.sortBy(r => (-r._3, r._1)).take(50).map(_._1).toSet
    val tc = u.sortBy(r => (-r._2, r._1)).take(50).map(_._1).toSet
    val nc = (tv & tc).size.toLong
    val row = Registry.byName("q_ret_7_topk_overlap").fn(spark, sf).collect().head
    assert(row.getLong(0) == 50L && row.getLong(1) == nc)
    assert(row.getDouble(2) == q6(nc.toDouble / (100 - nc)))
    assert(row.getDouble(3) == q6(nc.toDouble / 50))
  }

  test("q_text_40_idf_drift: quantized-integer shift ranking replicates") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val halves = docs.map { case (id, text) =>
      (id % 1000000007L * 2654435761L % 1000000007L % 2, id, text.split(" ", -1).distinct)
    }
    val n0 = halves.count(_._1 == 0).toLong
    val n1 = halves.count(_._1 == 1).toLong
    val df = scala.collection.mutable.Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    halves.foreach { case (h, _, toks) =>
      toks.foreach { t =>
        val (a, b) = df(t)
        df(t) = if (h == 0) (a + 1, b) else (a, b + 1)
      }
    }
    val shifts = df.toSeq.map { case (tok, (d0, d1)) =>
      val s0 = math.floor(math.log((n0 + 1).toDouble / (d0 + 1)) * 1e6 + 0.5).toLong
      val s1 = math.floor(math.log((n1 + 1).toDouble / (d1 + 1)) * 1e6 + 0.5).toLong
      (tok, d0, d1, s0 - s1)
    }.sortBy(r => (-math.abs(r._4), r._1)).take(20)
    val got = Registry.byName("q_text_40_idf_drift").fn(spark, sf).collect()
    assert(got.length == 20)
    got.zip(shifts).zipWithIndex.foreach { case ((r, (tok, d0, d1, sq)), i) =>
      assert(r.getLong(0) == i + 1 && r.getString(1) == tok)
      assert(r.getLong(2) == d0 && r.getLong(3) == d1)
      assert(r.getDouble(4) == sq.toDouble / 1e6)
    }
  }

  test("q_stat_21_ols_inference: SE/t/CI replicate; CI brackets q_stat_5's slope") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_returnflag", "CAST(l_quantity AS LONG) AS x",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS LONG) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (grp, rs) =>
      val n = rs.length.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val syy = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val cov = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val vx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val vy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      val se = math.sqrt((vy - cov * cov / vx) / (n - 2) / vx)
      grp -> (n, q6(cov / vx / 100), q6(se / 100), q6(cov / vx / se),
        q6((cov / vx - 1.959964 * se) / 100), q6((cov / vx + 1.959964 * se) / 100))
    }
    val got = Registry.byName("q_stat_21_ols_inference").fn(spark, sf).collect()
    assert(got.length == expected.size)
    val slopes = Registry.byName("q_stat_5_ols").fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    got.foreach { r =>
      val (n, slope, se, t, lo, hi) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == slope)
      assert(r.getDouble(3) == se && r.getDouble(4) == t)
      assert(r.getDouble(5) == lo && r.getDouble(6) == hi)
      assert(lo <= slopes(r.getString(0)) && slopes(r.getString(0)) <= hi)
    }
  }

  test("q_dedup_14_lsh_sweep: more bands => lower threshold => no fewer candidates") {
    val got = Registry.byName("q_dedup_14_lsh_sweep").fn(spark, sf).collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    got.foreach { r => assert(r.getLong(0) * r.getLong(1) == 16L) }
    val thresholds = got.map(_.getDouble(2))
    assert(thresholds.sameElements(thresholds.sorted.reverse)) // monotone down in b
    val counts = got.map(_.getLong(3))
    assert(counts.sameElements(counts.sorted)) // monotone up in b
    // replicate the (8, 2) config end-to-end
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 100").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sig(text: String): Seq[Long] = {
      val toks = text.split(" ", -1)
      val sh = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toArray.distinct
      val hs = sh.map(charHash)
      (0L until 16L).map(i => hs.map(h => (h * (i * 2 + 3) + (i * 5 + 7)) % P).min)
    }
    val sigs = docs.map { case (id, t) => (id, sig(t)) }
    val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
    for (j <- 0 until 8) {
      val byBand = sigs.groupBy(_._2.slice(j * 2, j * 2 + 2))
      byBand.values.filter(_.length > 1).foreach { grp =>
        for (a <- grp; b <- grp if a._1 < b._1) pairs += ((a._1, b._1))
      }
    }
    assert(got(2).getLong(3) == pairs.size.toLong)
  }

  test("q_dedup_15_hamming_radius: probe bucket 0 contains the probe itself") {
    val got = Registry.byName("q_dedup_15_hamming_radius").fn(spark, sf).collect()
    assert(got.nonEmpty)
    val total = got.map(_.getLong(1)).sum
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == nDocs)
    assert(got.head.getLong(0) == 0L && got.head.getLong(2) == 0L) // probe at distance 0
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(0) * 4 && r.getLong(3) < (r.getLong(0) + 1) * 4)
      assert(r.getLong(2) <= r.getLong(3))
    }
  }
}
