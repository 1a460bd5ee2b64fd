package graft

import org.apache.spark.sql.functions._

/** Round-3e operators (regression + dependence statistics): brute-force
  * replications of the exact-BIGINT sufficient-statistic cores and
  * single-scan plan contracts.
  */
class Round3eOpsSpec extends SparkSpec {

  // the shared closed form, replicated in plain Scala with the same
  // operation shape as the query's final projection
  private def ols(pts: Seq[(Long, Long)]): (Double, Double) = {
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (slope, (sy - slope * sx) / n)
  }

  private def round6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000

  test("q_stat_5_ols: per-group closed form matches a driver-side replication") {
    val pts = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val got = Registry.byName("q_stat_5_ols").fn(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == got.map(_.getString(0)).toSeq.sorted)
    got.foreach { r =>
      val grp = r.getString(0)
      val (slope, icept) = ols(pts(grp))
      assert(r.getLong(1) == pts(grp).length)
      assert(r.getDouble(2) == round6(slope / 100), s"slope mismatch for $grp")
      assert(r.getDouble(3) == round6(icept / 100), s"intercept mismatch for $grp")
    }
  }

  test("q_stat_6_mutualinfo: quantized cell sum matches replication; independent-ish data ⇒ small MI") {
    val cells = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = cells.values.sum
    val cx = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cy = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val expected = cells.map { case ((x, y), c) =>
      math.floor(c.toDouble / n.toDouble *
        math.log(c.toDouble * n.toDouble / (cx(x).toDouble * cy(y).toDouble)) * 1000000 + 0.5).toLong
    }.sum
    val row = Registry.byName("q_stat_6_mutualinfo").fn(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == cells.size)
    assert(row.getDouble(2) == expected.toDouble / 1000000, "quantized MI mismatch")
    // synthetic status/priority are near-independent: MI well under 0.1 nats
    // (quantization can push individual cells slightly negative)
    assert(math.abs(row.getDouble(2)) < 0.1)
  }

  test("q_text_25_zipf: log-log OLS matches replication and slopes downward") {
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(1000)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.floor(math.log((i + 1).toDouble) * 1000000 + 0.5).toLong,
        math.floor(math.log(c.toDouble) * 1000000 + 0.5).toLong)
    }
    val (slope, icept) = ols(pts.toSeq)
    val row = Registry.byName("q_text_25_zipf").fn(spark, sf).collect().head
    assert(row.getLong(0) == pts.length)
    assert(row.getDouble(1) == round6(slope), "slope mismatch")
    assert(row.getDouble(2) == round6(icept / 1000000), "intercept mismatch")
    assert(row.getDouble(1) < 0, "rank-frequency fit must slope downward")
  }

  test("q_agg_30_assoc: lift ranking matches a brute-force basket replication") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect().map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_brand").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val ob = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
    val no = ob.map(_._1).distinct.length.toLong
    val cb = ob.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = ob.groupBy(_._1).values.flatMap { basket =>
      val bs = basket.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- i + 1 until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairCounts.toSeq
      .filter(_._2 >= 50)
      .map { case ((b1, b2), c12) =>
        val lift6 = math.floor(c12.toDouble * no.toDouble / (cb(b1).toDouble * cb(b2).toDouble) * 1000000 + 0.5).toLong
        (b1, b2, c12, lift6)
      }
      .sortBy { case (b1, b2, _, lift6) => (-lift6, b1, b2) }
      .take(20)
    val got = Registry.byName("q_agg_30_assoc").fn(spark, sf).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (b1, b2, c12, lift6)) =>
      assert(r.getString(0) == b1 && r.getString(1) == b2, s"pair order mismatch at rn=${r.getLong(5)}")
      assert(r.getLong(2) == c12)
      assert(r.getDouble(4) == lift6.toDouble / 1000000)
      assert(r.getDouble(3) == math.floor(c12.toDouble / no.toDouble * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_stream_13_markov: transition counts match a per-user sequence replication; rows normalize") {
    val evs = sources.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts"))) // µs regardless of the fixture's ts layout
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).values.flatMap { seq =>
      seq.sortBy(e => (e._4, e._2)).map(_._3).sliding(2).filter(_.length == 2)
        .map(w => (w(0), w(1)))
    }.groupBy(p => p).view.mapValues(_.size.toLong).toMap
    val got = Registry.byName("q_stream_13_markov").fn(spark, sf).collect()
    assert(got.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap == expected)
    // per-state totals and row-normalization (within quantization slack)
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sum == rows.head.getLong(3))
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < rows.length * 5e-7 + 1e-9)
    }
  }

  test("q_time_27_acf: lag-0 identity, symmetry of the integer core, bounded values") {
    val rows = Registry.byName("q_time_27_acf").fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    val den = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) == den), "shared denominator")
    // brute-force replication over the daily count series
    val days = sources.Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .count().collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val n = days.size.toLong; val sTot = days.values.sum
    val dev = days.view.mapValues(x => n * x - sTot).toMap
    val expDen = dev.values.map(v => v * v).sum
    assert(den == expDen, s"den $den != $expDen")
    rows.foreach { r =>
      val k = r.getLong(0)
      val num = dev.map { case (dd, v) =>
        dev.get(dd.minusDays(k)).map(_ * v).getOrElse(0L)
      }.sum
      assert(r.getLong(1) == num, s"num mismatch at lag $k")
      assert(math.abs(r.getDouble(3)) <= 1.0)
    }
  }

  test("q_stat_7_survival: survivor function is monotone non-increasing in (0,1] until 0") {
    val rows = Registry.byName("q_stat_7_survival").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
    val ss = rows.map(_.getDouble(3))
    assert(ss.zip(ss.tail).forall { case (a, b) => b <= a + 1e-12 }, "monotone")
    assert(ss.forall(s0 => s0 >= 0.0 && s0 <= 1.0))
    // n_risk is non-increasing and d <= n_risk everywhere
    val nr = rows.map(_.getLong(2))
    assert(nr.zip(nr.tail).forall { case (a, b) => b <= a })
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)))
  }

  test("q_sim_16_rrf: fusion scores match the two independently-computed rank lists") {
    val got = Registry.byName("q_sim_16_rrf").fn(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val expected = (math.floor(1000000.0 / (60 + r.getLong(1)) + 0.5)
        + math.floor(1000000.0 / (60 + r.getLong(2)) + 0.5)) / 1000000
      assert(r.getDouble(3) == expected)
    }
    // fused order is by score desc then id
    val scores = got.map(r => (-r.getDouble(3), r.getLong(0)))
    assert(scores.toSeq == scores.toSeq.sorted)
  }

  test("q_dq_19_fd: a held dependency audits clean; a violated one doesn't") {
    // l_partkey -> p_brand genuinely holds (brand is a function of part)
    import org.apache.spark.sql.functions.countDistinct
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val pt = spark.read.parquet(s"$sf/part.parquet")
    val held = li.join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey").agg(countDistinct("p_brand").as("nd"))
      .filter(col("nd") > 1).count()
    assert(held == 0, "brand must be functionally determined by partkey")
    val rows = Registry.byName("q_dq_19_fd").fn(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val expected = math.floor(r.getLong(2).toDouble / r.getLong(1).toDouble * 1000000 + 0.5) / 1000000
      assert(r.getDouble(4) == expected)
    }
    // the synthetic data violates all three candidates somewhere
    assert(rows.forall(_.getLong(3) >= 1))
  }

  test("q_scan_16_weighted_sample: keys replicate from the split hash; selection favors long docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1)))
    val keys = docs.map { case (id, w) =>
      val hv = ((id % 1000000007L) * 2654435761L) % 1000000007L
      val key9 = math.floor(math.log((hv + 1).toDouble / 1000000008.0) / w.toDouble * 1000000000 + 0.5).toLong
      (id, w, key9)
    }
    val expected = keys.sortBy { case (id, _, k) => (-k, id) }.take(20)
    val got = Registry.byName("q_scan_16_weighted_sample").fn(spark, sf).collect()
    assert(got.length == 20)
    got.zip(expected).foreach { case (r, (id, w, key9)) =>
      assert(r.getLong(0) == id && r.getLong(1) == w)
      assert(r.getDouble(2) == key9.toDouble / 1000000000)
    }
    // weighting sanity: the sample's mean doc length exceeds the corpus mean
    val sampleMean = got.map(_.getLong(1)).sum.toDouble / got.length
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean, s"weighted sample should favor long docs ($sampleMean vs $corpusMean)")
  }

  test("q_text_26_coverage: cumulative shares replicate and increase toward 1") {
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    val got = Registry.byName("q_text_26_coverage").fn(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(5L, 10L, 25L))
    got.foreach { r =>
      val k = r.getLong(0).toInt
      val cum = counts.take(k).map(_._2).sum
      assert(r.getLong(1) == cum && r.getLong(2) == total)
      assert(r.getDouble(3) == math.floor(cum.toDouble / total.toDouble * 1000000 + 0.5) / 1000000)
    }
    val cov = got.map(_.getDouble(3))
    assert(cov.zip(cov.tail).forall { case (a, b) => b > a } && cov.last <= 1.0)
  }

  test("q_stream_14_interarrival: sufficient statistics replicate; CV is the fixed closed form") {
    val evs = sources.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // order at MICROSECOND precision (the query's sort key); gap values
    // truncate to whole seconds afterwards — sg2 is order-sensitive
    val stats = evs.groupBy(_._1).view.mapValues { seq =>
      val gaps = seq.sortBy(e => (e._3, e._2)).map(e => e._3 / 1000000)
        .sliding(2).filter(_.length == 2).map(w => w(1) - w(0)).toArray
      (gaps.length.toLong, gaps.sum, gaps.map(g => g * g).sum)
    }.toMap.filter(_._2._1 >= 2)
    val got = Registry.byName("q_stream_14_interarrival").fn(spark, sf).collect()
    assert(got.length == stats.size)
    got.foreach { r =>
      val (m, sg, sg2) = stats(r.getLong(0))
      assert(r.getLong(1) == m && r.getLong(2) == sg && r.getLong(3) == sg2)
      val cv = math.floor(math.sqrt(m.toDouble * sg2.toDouble - sg.toDouble * sg.toDouble)
        / sg.toDouble * 1000000 + 0.5) / 1000000
      assert(r.getDouble(4) == cv)
    }
  }

  test("q_stat_9_theilsen: pairwise-slope median matches a brute-force replication") {
    val days = sources.Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .count().collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val x0 = days.map(_._1).min
    val idx = days.map { case (dd, y) => (java.time.temporal.ChronoUnit.DAYS.between(x0, dd), y) }
    val slopes = (for {
      (xi, yi) <- idx; (xj, yj) <- idx if xj > xi
    } yield math.floor((yj - yi).toDouble / (xj - xi).toDouble * 1000000 + 0.5).toLong).sorted
    val m = slopes.length
    val med2 = if (m % 2 == 0) slopes(m / 2 - 1) + slopes(m / 2) else slopes((m - 1) / 2)
    val divisor = if (m % 2 == 0) 2.0 else 1.0
    val row = Registry.byName("q_stat_9_theilsen").fn(spark, sf).collect().head
    assert(row.getLong(0) == m)
    assert(row.getLong(1) == med2)
    assert(row.getDouble(2) == med2.toDouble / divisor / 1000000)
  }

  test("q_agg_31_means: AM >= GM >= HM per group; quantized cores replicate") {
    val vals = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = Registry.byName("q_agg_31_means").fn(spark, sf).collect()
    got.foreach { r =>
      val vs = vals(r.getString(0))
      assert(r.getLong(1) == vs.length)
      val sl = vs.map(v => math.floor(math.log(v.toDouble) * 1000000 + 0.5).toLong).sum
      val si = vs.map(v => math.floor(1000000000000.0 / v.toDouble + 0.5).toLong).sum
      val g = math.floor(math.exp(sl.toDouble / vs.length / 1000000) / 100 * 1000000 + 0.5) / 1000000
      val h = math.floor(vs.length.toDouble * 1000000000000.0 / si.toDouble / 100 * 1000000 + 0.5) / 1000000
      assert(r.getDouble(2) == g && r.getDouble(3) == h)
      // Pythagorean mean inequality on positive data
      val am = vs.map(_.toDouble / 100).sum / vs.length
      assert(am >= r.getDouble(2) && r.getDouble(2) >= r.getDouble(3))
    }
  }

  test("q_graph_7_linkpred: jaccard values replicate from the adjacency sets") {
    val rows = Registry.byName("q_graph_7_linkpred").fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // rebuild adjacency from the same sampled graph definition
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") % 200 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byOrder = li.groupBy(_._1)
    val edges = byOrder.values.flatMap { lines =>
      // (orderkey, linenumber) is NOT unique in the fixture — multimap
      val m = lines.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
      // .toSeq first: flatMap on a Map of pairs would collapse by key
      m.toSeq.flatMap { case (ln, ss) =>
        m.getOrElse(ln + 1, Set.empty)
          .flatMap(t => ss.filter(_ != t).map(s => (s, t)))
      }
    }.toSet
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val inter = adj(a).intersect(adj(b)).size.toLong
      val union = adj(a).union(adj(b)).size.toLong
      assert(r.getLong(2) == inter, s"common-neighbor count mismatch for ($a,$b)")
      assert(r.getLong(3) == adj(a).size && r.getLong(4) == adj(b).size)
      assert(r.getDouble(5) == math.floor(inter.toDouble / union.toDouble * 1000000 + 0.5) / 1000000)
    }
    // ranking is by quantized jaccard desc then pair
    val ord = rows.map(r => (-math.floor(r.getDouble(5) * 1000000).toLong, r.getLong(0), r.getLong(1)))
    assert(ord.toSeq == ord.toSeq.sorted)
  }

  test("q_dq_20_corrmatrix: each pair matches the single-pair exact Pearson replication") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") + 0.5).cast("long"),
        floor(col("l_discount") * 100 + 0.5).cast("long"),
        floor(col("l_tax") * 100 + 0.5).cast("long"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def corr(i: Int, j: Int): Double = {
      val n = rows.length.toDouble
      val sa = rows.map(_(i)).sum.toDouble; val sb = rows.map(_(j)).sum.toDouble
      val saa = rows.map(r => r(i) * r(i)).sum.toDouble
      val sbb = rows.map(r => r(j) * r(j)).sum.toDouble
      val sab = rows.map(r => r(i) * r(j)).sum.toDouble
      math.floor((n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)) * 1000000 + 0.5) / 1000000
    }
    val idx = Map("quantity" -> 0, "price" -> 1, "discount" -> 2, "tax" -> 3)
    val got = Registry.byName("q_dq_20_corrmatrix").fn(spark, sf).collect()
    assert(got.length == 6)
    got.foreach { r =>
      val Array(a, b) = r.getString(0).split("~")
      assert(r.getDouble(1) == corr(idx(a), idx(b)), s"corr mismatch for ${r.getString(0)}")
      assert(math.abs(r.getDouble(1)) <= 1.0)
    }
  }

  test("q_text_27_confusion: cells partition the corpus; shares sum to 1 per label") {
    val rows = Registry.byName("q_text_27_confusion").fn(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total, "every doc lands in exactly one cell")
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3))
      assert(math.abs(cells.map(_.getDouble(4)).sum - 1.0) < cells.length * 5e-7 + 1e-9)
    }
    // the prediction column agrees with the declared langid query
    val pred = Registry.byName("q_text_4_langid").fn(spark, sf).collect()
      .groupBy(r => (r.getString(1), r.getString(5))).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap == pred)
  }

  test("q_time_6_seasonality: weekday cells partition the days; strength in [0,1] matches ANOVA replication") {
    val days = sources.Tables(spark, sf, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
      .count().collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val n = days.length.toLong; val sTot = days.map(_._2).sum
    val ssTot = days.map { case (_, x) => val dv = n * x - sTot; dv * dv }.sum
    val byDow = days.groupBy(_._1.getDayOfWeek.getValue)
    val bq = byDow.view.mapValues { ds =>
      val m = ds.length.toLong; val sw = ds.map(_._2).sum
      val diff = n.toDouble * sw.toDouble - m.toDouble * sTot.toDouble
      math.floor(diff * diff / m.toDouble + 0.5).toLong
    }.toMap
    val strength = math.floor(bq.values.sum.toDouble / ssTot.toDouble * 1000000 + 0.5) / 1000000
    val got = Registry.byName("q_time_6_seasonality").fn(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == n, "weekday cells partition the day set")
    got.foreach { r =>
      val dow = r.getLong(0).toInt
      val ds = byDow(dow)
      assert(r.getLong(1) == ds.length)
      assert(r.getDouble(2) == math.floor(ds.map(_._2).sum.toDouble / ds.length * 1000000 + 0.5) / 1000000)
      assert(r.getDouble(3) == strength)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q_dq_21_keycand: distinct counts replicate; only the key column flags") {
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val got = Registry.byName("q_dq_21_keycand").fn(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getInt(4)))).toMap
    val total = ord.count()
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority").foreach { c =>
      val nd = ord.select(c).distinct().count()
      val (gnd, gn, isKey) = got(c)
      assert(gnd == nd && gn == total)
      assert(isKey == (if (nd == total) 1 else 0))
    }
    assert(got("o_orderkey")._3 == 1 && got("o_custkey")._3 == 0)
  }

  test("q_sim_17_silhouette: cluster sizes match q_sim_7's assignment; scores bounded") {
    val got = Registry.byName("q_sim_17_silhouette").fn(spark, sf).collect()
    val sizes = Registry.byName("q_sim_7_kmeans").fn(spark, sf).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toMap == sizes,
      "silhouette must be computed over the same trained assignment as q_sim_7")
    assert(got.map(_.getLong(1)).sum == 200)
    got.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("q_text_28_compression: sums replicate; corpus ratio sits inside the per-doc extremes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("n_chars"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byLang = docs.groupBy(_._1)
    val got = Registry.byName("q_text_28_compression").fn(spark, sf).collect()
    assert(got.length == byLang.size)
    got.foreach { r =>
      val ds = byLang(r.getString(0))
      assert(r.getLong(1) == ds.length)
      assert(r.getLong(2) == ds.map(_._2).sum && r.getLong(3) == ds.map(_._3).sum)
      val ratios = ds.map(d => math.floor(d._2.toDouble / d._3.toDouble * 1000000 + 0.5) / 1000000)
      assert(r.getDouble(5) == ratios.min && r.getDouble(6) == ratios.max)
      assert(r.getDouble(4) >= r.getDouble(5) - 1e-6 && r.getDouble(4) <= r.getDouble(6) + 1e-6)
    }
  }

  test("q_dedup_10_eval: counts consistent with q_dedup_3; metrics are the quantized ratios") {
    val row = Registry.byName("q_dedup_10_eval").fn(spark, sf).collect().head
    val (nTruth, nCand, tp) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // the candidate set IS q_dedup_3's pair list (distinct pairs)
    val lshPairs = Registry.byName("q_dedup_3_minhash_lsh").fn(spark, sf).count()
    assert(nCand == lshPairs)
    assert(tp <= math.min(nTruth, nCand))
    assert(row.getDouble(3) == math.floor(tp.toDouble / nCand * 1000000 + 0.5) / 1000000)
    assert(row.getDouble(4) == math.floor(tp.toDouble / nTruth * 1000000 + 0.5) / 1000000)
    assert(row.getDouble(5) == math.floor(2.0 * tp / (nCand + nTruth) * 1000000 + 0.5) / 1000000)
    // the LSH screen is a candidate GENERATOR: recall must dominate precision
    assert(row.getDouble(4) >= row.getDouble(3))
  }

  test("plan contracts: round-3e statistics are single-scan") {
    def scans(q: String): Int =
      "(?m)^\\(\\d+\\) Scan parquet".r.findAllIn(
        Registry.byName(q).fn(spark, sf).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))).length
    assert(scans("q_stat_5_ols") == 1)
    assert(scans("q_stat_6_mutualinfo") == 1)
    assert(scans("q_text_25_zipf") == 1)
    assert(scans("q_stream_13_markov") == 1)
    // assoc/acf read parquet only while materializing their checkpointed
    // aggregates; the declared plans themselves must not rescan sources
    assert(scans("q_agg_30_assoc") == 0)
    assert(scans("q_time_27_acf") == 0)
    // survival: one live pass (purchase join); the per-user stage table
    // is checkpointed. fd: one scan per audited table.
    assert(scans("q_stat_7_survival") == 1)
    assert(scans("q_dq_19_fd") == 2)
    assert(scans("q_stat_9_theilsen") == 0) // checkpointed day table
    assert(scans("q_stat_8_welch") == 1)
    assert(scans("q_agg_31_means") == 1)
    assert(scans("q_graph_7_linkpred") == 0) // checkpointed bidirectional edges
    assert(scans("q_dq_20_corrmatrix") == 1) // 6 pairs, ONE pass
    assert(scans("q_text_27_confusion") == 1)
    assert(scans("q_time_6_seasonality") == 0) // checkpointed day table
    assert(scans("q_dq_21_keycand") == 1)
    assert(scans("q_text_28_compression") == 1)
    // silhouette: one live embeddings scan (distance ranking); the
    // trained centroid table is checkpointed (see the 7.9s->1.2s note)
    assert(scans("q_sim_17_silhouette") == 1)
  }
}
