package graft

/** Round-5f operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5e suites).
  */
class Round5fOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("q_dedup_13_cross_lang: token-set keys counted once; cross-lang subset of dups") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keys = docs.map { case (_, text, lang) =>
      (text.split(" ", -1).distinct.sorted.mkString(" "), lang)
    }
    val byKey = keys.groupBy(_._1)
    val nKeys = byKey.size.toLong
    val nDup = byKey.count(_._2.length > 1).toLong
    val cross = byKey.filter(_._2.map(_._2).distinct.length > 1)
    val row = Registry.byName("q_dedup_13_cross_lang").fn(spark, sf).collect().head
    assert(row.getLong(0) == nKeys && row.getLong(1) == nDup)
    assert(row.getLong(2) == cross.size.toLong)
    assert(row.getLong(3) == cross.values.map(_.length.toLong).sum)
    assert(row.getDouble(4) == q6(cross.size.toDouble / nKeys))
    assert(row.getLong(2) <= row.getLong(1)) // cross-lang keys are duplicate keys
  }

  test("q_sim_20_centroid_shift: integer-core cosine; normalizations cancel") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Float](2).toArray))
    val expected = vecs.groupBy(_._2).map { case (label, rows) =>
      val halves = rows.map { case (id, _, v) =>
        (id % 1000000007L * 2654435761L % 1000000007L % 2,
          v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong))
      }
      val a = halves.filter(_._1 == 0).map(_._2)
      val b = halves.filter(_._1 == 1).map(_._2)
      val dims = rows.head._3.length
      val sa = (0 until dims).map(d0 => a.map(_(d0)).sum)
      val sb = (0 until dims).map(d0 => b.map(_(d0)).sum)
      val dot = sa.zip(sb).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val qa = sa.map(x => BigInt(x) * BigInt(x)).sum
      val qb = sb.map(x => BigInt(x) * BigInt(x)).sum
      label -> (a.length.toLong, b.length.toLong,
        q6(dot.toDouble / (math.sqrt(qa.toDouble) * math.sqrt(qb.toDouble))))
    }
    val got = Registry.byName("q_sim_20_centroid_shift").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (na, nb, cos) = expected(r.getLong(0))
      assert(r.getLong(1) == na && r.getLong(2) == nb)
      assert(r.getDouble(3) == cos, s"label ${r.getLong(0)}")
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q_stream_20_dau_wau: WAU via 7-day contribution explode; stickiness <= 1") {
    val ud = events.map(e => (e._3, e._2 / 86400000000L)).distinct
    val dau = ud.groupBy(_._2).map { case (d0, rows) => d0 -> rows.length.toLong }
    val wau = ud.flatMap { case (u, d0) => (0 to 6).map(g => (u, d0 + g)) }
      .distinct.groupBy(_._2).map { case (d0, rows) => d0 -> rows.length.toLong }
    val d0 = ud.map(_._2).min
    val expected = dau.filter(_._1 >= d0 + 6).map { case (day, da) =>
      day -> (da, wau(day), q6(da.toDouble / wau(day)))
    }
    val got = Registry.byName("q_stream_20_dau_wau").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (da, wa, st) = expected(r.getLong(0))
      assert(r.getLong(1) == da && r.getLong(2) == wa && r.getDouble(3) == st)
      assert(st <= 1.0 + 1e-9 && da <= wa)
    }
  }

  test("q_dq_23_last_digit: shares sum to 1; chi2 terms replicate") {
    val digits = events.map(e => math.floor(e._5 * 100 + 0.5).toLong % 10)
    val tot = digits.length.toLong
    val byDigit = digits.groupBy(identity).map { case (d0, rows) => d0 -> rows.length.toLong }
    val got = Registry.byName("q_dq_23_last_digit").fn(spark, sf).collect()
    assert(got.length == byDigit.size)
    var shareSum = 0.0
    got.foreach { r =>
      val n = byDigit(r.getLong(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == q6(n.toDouble / tot))
      val e = tot.toDouble / 10
      assert(r.getDouble(3) == q6((n.toDouble - e) * (n.toDouble - e) / e))
      shareSum += r.getDouble(2)
    }
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  test("q_stat_20_power: sample sizes replicate; 90% needs more than 80%") {
    def stats(tp: String) = {
      val xs = events.filter(_._4 == tp).map(r => math.floor(r._5 * 100 + 0.5).toLong)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (n1, s1, ss1) = stats("purchase")
    val (n0, s0, ss0) = stats("click")
    val dd = (s1.toDouble / n1 - s0.toDouble / n0) /
      math.sqrt(((ss1.toDouble - s1.toDouble * s1 / n1)
        + (ss0.toDouble - s0.toDouble * s0 / n0)) / (n1 + n0 - 2))
    val n80 = math.ceil(2 * (1.959964 + 0.841621) * (1.959964 + 0.841621) / (dd * dd)).toLong
    val n90 = math.ceil(2 * (1.959964 + 1.281552) * (1.959964 + 1.281552) / (dd * dd)).toLong
    val row = Registry.byName("q_stat_20_power").fn(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n0)
    assert(row.getDouble(2) == q6(dd))
    assert(row.getLong(3) == n80 && row.getLong(4) == n90)
    assert(n90 > n80)
  }

  test("q_text_38_position_bias: quantized relative positions; organic text near 0.5") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ", -1))
    val tf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach(_.foreach(t => tf(t) += 1))
    val top = tf.toSeq.sortBy(r => (-r._2, r._1)).take(10).zipWithIndex
      .map { case ((tok, f), i) => tok -> (i + 1L, f) }.toMap
    val sums = scala.collection.mutable.Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    docs.filter(_.length > 1).foreach { toks =>
      toks.zipWithIndex.foreach { case (t, p) =>
        if (top.contains(t)) {
          val rq = math.floor(p.toDouble / (toks.length - 1) * 1e6 + 0.5).toLong
          val (c, s) = sums(t); sums(t) = (c + 1, s + rq)
        }
      }
    }
    val got = Registry.byName("q_text_38_position_bias").fn(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val tok = r.getString(1)
      val (rnk, _) = top(tok)
      val (occ, s) = sums(tok)
      assert(r.getLong(0) == rnk && r.getLong(2) == occ)
      assert(r.getDouble(3) == math.floor(s.toDouble / occ + 0.5) / 1e6)
      assert(r.getDouble(3) > 0.3 && r.getDouble(3) < 0.7) // organic, not boilerplate
    }
  }

  test("q_win_13_drawdown: stacked prefix windows replicate; dd = peak - cum >= 0") {
    val byDay = events.groupBy(_._2 / 86400000000L).map { case (day, rows) =>
      val net = rows.filter(_._4 == "purchase").map(r => math.floor(r._5 * 100 + 0.5).toLong).sum -
        rows.filter(_._4 == "error").map(r => math.floor(r._5 * 100 + 0.5).toLong).sum
      (day, net)
    }.toSeq.sortBy(_._1)
    var cum = 0L; var peak = Long.MinValue
    val rows = byDay.map { case (day, net) =>
      cum += net; peak = math.max(peak, cum)
      (day, cum, peak, peak - cum)
    }
    val best = rows.minBy(r => (-r._4, r._1))
    val row = Registry.byName("q_win_13_drawdown").fn(spark, sf).collect().head
    assert(row.getLong(0) == best._1 && row.getLong(1) == byDay.length.toLong)
    assert(row.getDouble(2) == q2(best._2.toDouble / 100))
    assert(row.getDouble(3) == q2(best._3.toDouble / 100))
    assert(row.getDouble(4) == q2(best._4.toDouble / 100))
    assert(row.getDouble(5) == q6(best._4.toDouble / best._3))
    assert(best._4 >= 0)
  }
}
