package graft

/** Round-5e operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5d suites).
  */
class Round5eOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  private lazy val purchaseDays: Seq[(Long, Seq[Long])] =
    events.filter(_._4 == "purchase").groupBy(_._2 / 86400000000L)
      .map { case (day, rows) =>
        day -> rows.map(r => math.floor(r._5 * 100 + 0.5).toLong).toSeq
      }.toSeq.sortBy(_._1)

  test("q_win_12_bollinger: 7-day rolling bands off exact cents sums; flag consistent") {
    val daily = purchaseDays.map { case (day, cents) => (day, cents.sum) }
    val expected = daily.zipWithIndex.drop(6).map { case ((day, c), i) =>
      val win = daily.slice(i - 6, i + 1).map(_._2)
      val k = 7L
      val s = win.sum
      val ss = win.map(v => v * v).sum
      val mean = s.toDouble / k
      val band = 2 * math.sqrt((k.toDouble * ss - s.toDouble * s) / (k.toDouble * k * (k - 1)))
      val outside = if (c.toDouble < mean - band || c.toDouble > mean + band) 1L else 0L
      day -> (q2(c.toDouble / 100), q2(mean / 100), q2((mean - band) / 100),
        q2((mean + band) / 100), outside)
    }.toMap
    val got = Registry.byName("q_win_12_bollinger").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (v, mid, lo, hi, out) = expected(r.getLong(0))
      assert(r.getDouble(1) == v && r.getDouble(2) == mid)
      assert(r.getDouble(3) == lo && r.getDouble(4) == hi && r.getLong(5) == out,
        s"day ${r.getLong(0)}")
      assert(lo <= mid && mid <= hi)
    }
  }

  test("q_agg_34_hhi: rational concentration in [1/n, 1]; monopoly nation = 1") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_suppkey", "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS LONG) AS rev")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val supNation = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nationName = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val expected = li.groupBy(r => supNation(r._1)).map { case (nk, rows) =>
      val perSup = rows.groupBy(_._1).map { case (_, rs) => rs.map(_._2).sum }.toSeq
      val tot = perSup.sum
      val sumsq = perSup.map(s => BigInt(s) * BigInt(s)).sum
      nationName(nk) -> (perSup.length.toLong, tot,
        q6(sumsq.toDouble / (tot.toDouble * tot.toDouble)), q6(perSup.max.toDouble / tot))
    }
    val got = Registry.byName("q_agg_34_hhi").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, tot, hhi, top) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == tot)
      assert(r.getDouble(3) == hhi && r.getDouble(4) == top, s"${r.getString(0)}")
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6)
      if (n == 1) assert(hhi == 1.0)
    }
  }

  test("q_stat_18_dispersion: D = var/mean; integer verdict matches the float ratio") {
    val counts = purchaseDays.map(_._2.length.toLong)
    val n = counts.length.toLong
    val s = counts.sum
    val ss = counts.map(c => c * c).sum
    val num = n.toDouble * ss - s.toDouble * s
    val row = Registry.byName("q_stat_18_dispersion").fn(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == q2(s.toDouble / n))
    assert(row.getDouble(2) == q4(num / (n.toDouble * (n - 1))))
    assert(row.getDouble(3) == q6(num / ((n.toDouble - 1) * s)))
    assert(row.getDouble(4) == q6(num / s.toDouble))
    val verdict = if (n * ss - s * s > s * (n - 1)) 1L else 0L
    assert(row.getLong(5) == verdict)
    assert((row.getDouble(3) > 1.0) == (verdict == 1L))
  }

  test("q_stat_19_cohen_d: pooled-std effect size; |g| < |d|") {
    def stats(tp: String) = {
      val xs = events.filter(_._4 == tp).map(r => math.floor(r._5 * 100 + 0.5).toLong)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (n1, s1, ss1) = stats("purchase")
    val (n0, s0, ss0) = stats("click")
    val m1 = s1.toDouble / n1; val m0 = s0.toDouble / n0
    val pooled = math.sqrt(((ss1.toDouble - s1.toDouble * s1 / n1)
      + (ss0.toDouble - s0.toDouble * s0 / n0)) / (n1 + n0 - 2))
    val dEff = (m1 - m0) / pooled
    val g = dEff * (1 - 3.0 / (4.0 * (n1 + n0) - 9))
    val row = Registry.byName("q_stat_19_cohen_d").fn(spark, sf).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n0)
    assert(row.getDouble(2) == q2(m1 / 100) && row.getDouble(3) == q2(m0 / 100))
    assert(row.getDouble(4) == q6(dEff) && row.getDouble(5) == q6(g))
    assert(math.abs(row.getDouble(5)) < math.abs(row.getDouble(4)) + 1e-9)
  }

  test("q_text_37_burstiness: tf/df exact for the top-20; function words near-even") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val nDocs = docs.length.toLong
    val tf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val dfSets = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    docs.foreach { case (id, toks) =>
      toks.foreach { t =>
        tf(t) += 1
        dfSets.getOrElseUpdate(t, scala.collection.mutable.Set.empty) += id
      }
    }
    val top = tf.toSeq.sortBy(r => (-r._2, r._1)).take(20)
    val got = Registry.byName("q_text_37_burstiness").fn(spark, sf).collect()
    assert(got.length == 20)
    got.zip(top).zipWithIndex.foreach { case ((r, (tok, f)), i) =>
      assert(r.getLong(0) == i + 1 && r.getString(1) == tok && r.getLong(2) == f)
      val df = dfSets(tok).size.toLong
      assert(r.getLong(3) == df)
      assert(r.getDouble(4) == q4(f.toDouble / df))
      assert(r.getDouble(5) == q6(math.log((nDocs + 1).toDouble / (df + 1))))
    }
  }

  test("q_stream_19_time_to_convert: exact gap order statistics over converted users") {
    val gaps = events.groupBy(_._3).values.flatMap { rows =>
      val sign = rows.filter(_._4 == "signup").map(_._2)
      val pur = rows.filter(_._4 == "purchase").map(_._2)
      if (sign.nonEmpty && pur.nonEmpty && pur.min > sign.min) Some((rows.head._3, pur.min - sign.min))
      else None
    }.toSeq
    val n = gaps.length.toLong
    val sorted = gaps.sortBy(g => (g._2, g._1)).map(_._2)
    val row = Registry.byName("q_stream_19_time_to_convert").fn(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == q2(gaps.map(_._2).sum.toDouble / n / 60000000L))
    assert(row.getLong(2) == sorted(((n + 1) / 2).toInt - 1) / 1000000L)
    assert(row.getLong(3) == sorted(((9 * n + 9) / 10).toInt - 1) / 1000000L)
  }

  test("q_graph_10_reciprocity: reverse-join count over the distinct precedence edges") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter("l_orderkey % 50 = 0")
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { rows =>
      rows.toSeq.flatMap(a => rows.toSeq.collect {
        case b if a._2 < b._2 && a._3 != b._3 => (a._3, b._3)
      })
    }.toSet
    val recip = edges.count { case (s0, d0) => edges.contains((d0, s0)) }.toLong
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).size.toLong
    val row = Registry.byName("q_graph_10_reciprocity").fn(spark, sf).collect().head
    assert(row.getLong(0) == nodes && row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) == recip)
    assert(row.getDouble(3) == q6(recip.toDouble / edges.size))
  }
}
