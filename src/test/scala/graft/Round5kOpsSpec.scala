package graft

/** Round-5k operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5j suites).
  */
class Round5kOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("q_time_12_ljungbox: Q from quantized ACF terms replicates; Q >= 0") {
    val byDay = events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (d0, rows) => d0 -> rows.length.toLong }.toSeq.sortBy(_._1)
    val n = byDay.length.toLong
    val sx = byDay.map(_._2).sum
    val dev = byDay.map { case (d0, x) => d0 -> (n * x - sx) }.toMap
    val den = dev.values.map(d0 => d0 * d0).sum
    val tq = (1 to 6).map { k =>
      val num = dev.flatMap { case (d0, v) => dev.get(d0 - k).map(_ * v) }.sum
      val r6 = math.floor(num.toDouble / den * 1e6 + 0.5).toLong
      math.floor((r6 * r6).toDouble / (n - k) + 0.5).toLong
    }.sum
    val q = q4(n.toDouble * (n + 2) * tq / 1e12)
    val row = Registry.byName("q_time_12_ljungbox").fn(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == 6L)
    assert(row.getDouble(2) == q)
    assert(q >= 0.0)
  }

  test("q_dedup_17_survivor_bias: kept+dropped partition the corpus; means replicate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val kept = docs.groupBy(_._2.split(" ", -1).distinct.sorted.mkString(" "))
      .map(_._2.map(_._1).min).toSet
    val expected = docs.groupBy(d => if (kept(d._1)) "kept" else "dropped")
      .map { case (st, rows) =>
        val stats = rows.map { case (_, t) =>
          val tk = t.split(" ", -1)
          (tk.length.toLong,
            math.floor(tk.distinct.length.toDouble / tk.length * 1e6 + 0.5).toLong)
        }
        st -> (rows.length.toLong, q2(stats.map(_._1).sum.toDouble / rows.length),
          math.floor(stats.map(_._2).sum.toDouble / rows.length + 0.5) / 1e6)
      }
    val got = Registry.byName("q_dedup_17_survivor_bias").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, ntok, ur) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == ntok && r.getDouble(3) == ur)
    }
    assert(got.map(_.getLong(1)).sum == docs.length.toLong)
  }

  test("q_ml_5_threshold: suffix-sum P/R/F1 replicates; exactly the max rows flagged") {
    val sorted = events.map(e => (math.floor(e._5 * 100 + 0.5).toLong, e._1,
      if (e._4 == "purchase") 1L else 0L)).sortBy(r => (r._1, r._2))
    val n = sorted.length
    val base = n / 10; val extra = n % 10
    val sizes = (1 to 10).map(i => if (i <= extra) base + 1 else base)
    val offsets = sizes.scanLeft(0)(_ + _)
    val deciles = (1 to 10).map(i => sorted.slice(offsets(i - 1), offsets(i)))
    val ks = deciles.map(_.map(_._3).sum)
    val ns = deciles.map(_.length.toLong)
    val kk = ks.sum
    val expected = (1 to 9).map { c =>
      val tp = (c until 10).map(ks(_)).sum
      val fp = (c until 10).map(i => ns(i) - ks(i)).sum
      val fn = kk - tp
      val f16 = math.floor(2.0 * tp / (2 * tp + fp + fn) * 1e6 + 0.5).toLong
      (c.toLong, tp, fp, fn, f16)
    }
    val best = expected.map(_._5).max
    val got = Registry.byName("q_ml_5_threshold").fn(spark, sf).collect()
    assert(got.length == 9)
    got.zip(expected).foreach { case (r, (c, tp, fp, fn, f16)) =>
      assert(r.getLong(0) == c && r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == fn)
      assert(r.getDouble(4) == (if (tp + fp > 0) q6(tp.toDouble / (tp + fp)) else 0.0))
      assert(r.getDouble(5) == q6(tp.toDouble / (tp + fn)))
      assert(r.getDouble(6) == f16.toDouble / 1e6)
      assert(r.getLong(7) == (if (f16 == best) 1L else 0L))
    }
    assert(got.map(_.getLong(7)).sum >= 1L)
  }

  test("q_mm_7_phash_radius: bucket counts cover the decode set; probe at distance 0") {
    val got = Registry.byName("q_mm_7_phash_radius").fn(spark, sf).collect()
    assert(got.nonEmpty)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id < 100 AND length(text) > 0").count()
    assert(got.map(_.getLong(1)).sum == nDocs)
    assert(got.head.getLong(0) == 0L && got.head.getLong(2) == 0L)
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(0) * 8 && r.getLong(3) < (r.getLong(0) + 1) * 8)
    }
  }

  test("q_text_43_lang_margin: margins positive; counts consistent with q_ml_3") {
    val got = Registry.byName("q_text_43_lang_margin").fn(spark, sf).collect()
    assert(got.nonEmpty)
    val conf = Registry.byName("q_ml_3_nb_confusion").fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    got.foreach { r =>
      val (nActual, tp) = conf(r.getString(0))
      assert(r.getLong(1) == nActual) // same per-language totals as the confusion gate
      assert(r.getLong(2) == tp)      // same correct counts (same score table)
      assert(r.getDouble(3) >= 0.0)   // top1 - top2 can't be negative
      assert(r.getLong(4) <= r.getLong(1))
    }
  }

  test("q_dq_27_col_entropy: norm entropy in (0, 1]; distinct counts replicate") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderstatus", "o_orderpriority",
        "date_format(date_trunc('month', o_orderdate), 'yyyy-MM') AS m",
        "CAST((unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 + 4) % 7 AS STRING) AS dow")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    def check(colName: String, vals: Seq[String], row: org.apache.spark.sql.Row): Unit = {
      val counts = vals.groupBy(identity).map(_._2.length.toLong)
      val tot = vals.length.toLong
      val hq = counts.map { c =>
        val p = c.toDouble / tot
        math.floor(-p * math.log(p) * 1e9 + 0.5).toLong
      }.sum
      assert(row.getLong(1) == counts.size.toLong, colName)
      assert(row.getDouble(2) == q6(hq.toDouble / 1e9), colName)
      assert(row.getDouble(3) == q6(hq.toDouble / 1e9 / math.log(counts.size.toDouble)), colName)
      assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0 + 1e-9)
    }
    val got = Registry.byName("q_dq_27_col_entropy").fn(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size == 4)
    check("o_orderpriority", orders.map(_._2), got("o_orderpriority"))
    check("o_orderstatus", orders.map(_._1), got("o_orderstatus"))
    check("order_dow", orders.map(_._4), got("order_dow"))
    check("order_month", orders.map(_._3), got("order_month"))
  }

  test("q_win_16_donchian: rolling extremes replicate; position in [0, 1]") {
    val daily = events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (d0, rows) => d0 -> rows.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum }
      .toSeq.sortBy(_._1)
    val expected = daily.zipWithIndex.drop(6).map { case ((d0, c), i) =>
      val win = daily.slice(i - 6, i + 1).map(_._2)
      val (lo, hi) = (win.min, win.max)
      val pos = if (hi > lo) q6((c - lo).toDouble / (hi - lo)) else 0.5
      d0 -> (q2(c.toDouble / 100), q2(lo.toDouble / 100), q2(hi.toDouble / 100), pos)
    }.toMap
    val got = Registry.byName("q_win_16_donchian").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (v, lo, hi, pos) = expected(r.getLong(0))
      assert(r.getDouble(1) == v && r.getDouble(2) == lo && r.getDouble(3) == hi)
      assert(r.getDouble(4) == pos)
      assert(pos >= 0.0 && pos <= 1.0)
    }
  }
}
