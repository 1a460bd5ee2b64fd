package graft

/** Round-5b operators: brute-force Scala replications of the integer-exact
  * cores and the single-IEEE-expression floats (same method as the
  * Round2–5 suites: recompute the statistic from collected fixture rows
  * with the identical quantization, assert bit-equality).
  */
class Round5bOpsSpec extends SparkSpec {

  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def ln9(x: Double): Long = math.floor(math.log(x) * 1e9 + 0.5).toLong

  /** Doubled average ranks (2·avgrank is always integral): value ->
    * 2·minrank + tiecount − 1, over the whole sorted column. */
  private def doubledRanks(values: Seq[Long]): Map[Long, Long] = {
    val sorted = values.sorted
    val minRank = sorted.zipWithIndex.reverse.toMap.map { case (v, i) => v -> (i + 1L) }
    val cnt = values.groupBy(identity).map { case (v, g) => v -> g.length.toLong }
    cnt.keys.map(v => v -> (2 * minRank(v) + cnt(v) - 1)).toMap
  }

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q_ret_5_auc: rank-sum identity replicates; gini = 2*auc - 1") {
    val cents = events.map { case (_, _, t, v) =>
      (math.floor(v * 100 + 0.5).toLong, if (t == "purchase") 1 else 0) }
    val r2 = doubledRanks(cents.map(_._1).toSeq)
    val n1 = cents.count(_._2 == 1).toLong
    val n0 = cents.count(_._2 == 0).toLong
    val r12 = cents.filter(_._2 == 1).map(c => r2(c._1)).sum
    val auc = q6((r12 - n1 * (n1 + 1)).toDouble / (2.0 * n1 * n0))
    val gini = q6((r12 - n1 * (n1 + 1)).toDouble / (1.0 * n1 * n0) - 1)
    val got = Registry.byName("q_ret_5_auc").fn(spark, sf).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == n1 && got(0).getLong(1) == n0)
    assert(got(0).getDouble(2) == auc, s"${got(0).getDouble(2)} != $auc")
    assert(got(0).getDouble(3) == gini)
    assert(auc >= 0.0 && auc <= 1.0)
    // naive direct AUC (pair-counting) agrees with the rank identity
    val pos = cents.filter(_._2 == 1).map(_._1)
    val neg = cents.filter(_._2 == 0).map(_._1)
    val wins = pos.map(p => neg.count(_ < p) + 0.5 * neg.count(_ == p)).sum
    assert(math.abs(wins / (n1.toDouble * n0) - auc) < 1e-6)
  }

  test("q_ml_2_nbayes: closed-form NB scores and argmax replicate") {
    val langs = docs.map(_._2).distinct.sorted
    val c = docs.flatMap(d => d._3.split(" ").map(t => ((d._2, t), 1L)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val nl = c.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val vocab = c.keysIterator.map(_._2).toSet.size.toLong
    val dl = docs.groupBy(_._2).map { case (l, g) => l -> g.length.toLong }
    val dd = docs.length.toLong
    val preds = docs.map { d =>
      val tfs = d._3.split(" ").groupBy(identity).map { case (t, g) => t -> g.length.toLong }
      val words = d._3.split(" ").length.toLong
      val best = langs.map { l =>
        val s1 = tfs.map { case (t, tf) =>
          c.get((l, t)).map(cc => tf * ln9((cc + 1).toDouble)).getOrElse(0L) }.sum
        val score = ln9(dl(l).toDouble / dd) + s1 - words * ln9((nl(l) + vocab).toDouble)
        (l, score)
      }.maxBy { case (l, s) => (s, -langs.indexOf(l)) }._1  // max score, tie -> lang asc
      (d._2, best)
    }
    val expected = preds.groupBy(_._1).map { case (l, g) =>
      val correct = g.count(p => p._2 == p._1).toLong
      l -> (g.length.toLong, correct, q4(correct.toDouble / g.length))
    }
    val got = Registry.byName("q_ml_2_nbayes").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, k, acc) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == k,
        s"${r.getString(0)}: (${r.getLong(1)}, ${r.getLong(2)}) != ($n, $k)")
      assert(r.getDouble(3) == acc)
    }
    // the classifier must at least beat the majority-class baseline
    val totalCorrect = expected.values.map(_._2).sum
    assert(totalCorrect > expected.values.map(_._1).max)
  }

  test("q_stat_13_kruskal: doubled-rank H and tie correction replicate") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val r2 = doubledRanks(orders.map(_._2).toSeq)
    val g = orders.groupBy(_._1).map { case (p, rows) =>
      val n = rows.length.toLong
      val s2 = rows.map(r => r2(r._2)).sum
      p -> (n, s2, math.floor(s2.toDouble * s2.toDouble / (4.0 * n)).toLong)
    }
    val nn = g.values.map(_._1).sum
    val tsum = g.values.map(_._3).sum
    val ties = orders.groupBy(_._2).values
      .map(v => { val t = v.length.toLong; t * t * t - t }).sum
    val hRaw = 12.0 / (nn.toDouble * (nn + 1)) * tsum - 3.0 * (nn + 1)
    val hTie = q6(hRaw / (1 - ties.toDouble / (nn.toDouble * nn * nn - nn)))
    val got = Registry.byName("q_stat_13_kruskal").fn(spark, sf).collect()
    assert(got.length == g.size)
    got.foreach { r =>
      val (n, s2, _) = g(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == q4(s2.toDouble / (2.0 * n)))
      assert(r.getDouble(3) == q6(hRaw), s"h ${r.getDouble(3)} != ${q6(hRaw)}")
      assert(r.getDouble(4) == hTie)
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9) // C <= 1 inflates H
    }
  }

  test("q_stat_14_jarque_bera: power-sum moments replicate; jb >= 0") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val expected = li.groupBy(_._1).map { case (f, rows) =>
      val n = rows.length.toLong
      val s1 = rows.map(_._2).sum
      val s2 = rows.map(r => r._2 * r._2).sum
      val s3 = rows.map(r => r._2 * r._2 * r._2).sum
      val s4 = rows.map(r => r._2 * r._2 * r._2 * r._2).sum
      val m1 = s1.toDouble / n
      val m2 = s2.toDouble / n - m1 * m1
      val m3 = s3.toDouble / n - 3 * m1 * (s2.toDouble / n) + 2 * m1 * m1 * m1
      val m4 = s4.toDouble / n - 4 * m1 * (s3.toDouble / n) +
        6 * m1 * m1 * (s2.toDouble / n) - 3 * m1 * m1 * m1 * m1
      val skew = m3 / (m2 * math.sqrt(m2))
      val exk = m4 / (m2 * m2) - 3
      f -> (n, q4(m1), q6(skew), q6(exk), q6(n.toDouble / 6 * (skew * skew + exk * exk / 4)))
    }
    val got = Registry.byName("q_stat_14_jarque_bera").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, m, sk, k, jb) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == m)
      assert(r.getDouble(3) == sk && r.getDouble(4) == k && r.getDouble(5) == jb,
        s"${r.getString(0)}: ${(r.getDouble(3), r.getDouble(4), r.getDouble(5))} != ${(sk, k, jb)}")
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("q_graph_9_clustcoef: set-based cc replicates; cc in [0, 1]") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .filter(_._1 % 10 == 0)
    val byOrder = li.groupBy(_._1)
    val edges = byOrder.values.flatMap { rows =>
      val byLn = rows.map(r => r._2 -> r._3).toMap
      byLn.flatMap { case (ln, s) =>
        byLn.get(ln + 1).filter(_ != s).map(t => (math.min(s, t), math.max(s, t))) }
    }.toSet
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2).toSet }
    val expected = nbrs.collect { case (node, nb) if nb.size >= 2 =>
      val tri = nb.toSeq.combinations(2).count(p =>
        edges.contains((math.min(p(0), p(1)), math.max(p(0), p(1)))))
      node -> (nb.size.toLong, tri.toLong,
        q6(2.0 * tri / (nb.size.toDouble * (nb.size - 1))))
    }
    val got = Registry.byName("q_graph_9_clustcoef").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (deg, tri, cc) = expected(r.getLong(0))
      assert(r.getLong(1) == deg && r.getLong(2) == tri,
        s"node ${r.getLong(0)}: (${r.getLong(1)}, ${r.getLong(2)}) != ($deg, $tri)")
      assert(r.getDouble(3) == cc)
      assert(cc >= 0.0 && cc <= 1.0)
    }
  }

  test("q_time_9_twap: duration-weighted mean replicates and differs from plain mean") {
    val expected = events.groupBy(_._3).map { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1)) // (us, event_id)
      val segs = sorted.zip(sorted.tail).map { case (a, b) =>
        (math.floor(a._4 * 100 + 0.5).toLong, b._2 - a._2) }
      val num = segs.map(s => s._1 * s._2).sum
      val den = segs.map(_._2).sum
      val sc = segs.map(_._1).sum
      t -> (segs.length.toLong, q4(num.toDouble / den / 100), q4(sc.toDouble / segs.length / 100))
    }
    val got = Registry.byName("q_time_9_twap").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, twap, mean) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == twap, s"${r.getString(0)}: ${r.getDouble(2)} != $twap")
      assert(r.getDouble(3) == mean)
    }
  }

  test("q_text_36_keyphrase: smoothed tf-idf top-3 replicates exactly") {
    val dd = docs.length.toLong
    val df = docs.flatMap(d => d._3.split(" ").distinct.map(t => (t, 1L)))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val top = docs.sortBy(d => (-d._4, d._1)).take(20)
    val expected = top.flatMap { d =>
      val tfs = d._3.split(" ").groupBy(identity).map { case (t, g) => t -> g.length.toLong }
      val scored = tfs.map { case (t, tf) => (t, tf * ln9((dd + 1).toDouble / (df(t) + 1))) }
      scored.toSeq.sortBy { case (t, s) => (-s, t) }.take(3).zipWithIndex.map {
        case ((t, s9), i) => (d._1, i + 1L, t, q6(s9.toDouble / 1e9)) }
    }.sortBy(e => (e._1, e._2))
    val got = Registry.byName("q_text_36_keyphrase").fn(spark, sf).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (id, rnk, tok, sc)) =>
      assert(r.getLong(0) == id && r.getLong(1) == rnk && r.getString(2) == tok,
        s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getString(2)}) != ($id, $rnk, $tok)")
      assert(r.getDouble(3) == sc)
    }
  }
}
