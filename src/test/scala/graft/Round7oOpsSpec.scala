package graft

/** Round-7o semantic-surface wave: brute-force replications on sf0.001. */
class Round7oOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }
  private def c2(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "text", "lang", "source", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  private lazy val cust = graft.sources.Tables(spark, sf, "customer")
    .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal").collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))

  test("q_json_7_token_array: JSON path extraction equals direct token access") {
    val exp = docs.filter(_._1 < 200).sortBy(_._1).map { case (id, text, _, _, _) =>
      val toks = text.split(" ", -1)
      (id, toks.length.toLong, toks.headOption.orNull,
        if (toks.length > 2) toks(2) else null,
        if (toks.length > 2) 1L else 0L)
    }
    val got = Registry.byName("q_json_7_token_array").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_join_27_anti_range: anti join equals NOT EXISTS brute force") {
    import org.apache.spark.sql.functions.{col, date_format}
    val ship = graft.sources.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), date_format(col("l_shipdate"), "yyyy-MM-dd").as("sd"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def days(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val exp = ord.filter { case (ok, od, _) =>
      !ship.getOrElse(ok, Seq.empty[String]).exists(sd => days(sd) - days(od) <= 7)
    }.groupBy(_._3).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = Registry.byName("q_join_27_anti_range").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exp.toSeq)
    assert(got.map(_._2).sum < ord.length, "some orders must have a fast ship")
  }

  test("q_time_28_bizdays: closed form equals a day-by-day calendar walk") {
    import org.apache.spark.sql.functions.{col, date_format, min => fmin}
    val fs = graft.sources.Tables(spark, sf, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(date_format(fmin(col("l_shipdate")), "yyyy-MM-dd").as("s0"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def walkFwd(a: java.time.LocalDate, b: java.time.LocalDate): Long = {
      var d = a; var n = 0L
      while (d.isBefore(b)) {
        if (d.getDayOfWeek.getValue <= 5) n += 1
        d = d.plusDays(1)
      }
      n
    }
    // Signed weekday distance: W(e2)-W(e1) is antisymmetric, so a ship
    // date BEFORE the order date (uncorrelated fixture columns) walks
    // backwards with negative sign.
    def walk(a: String, b: String): Long = {
      val (da, db) = (java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
      if (da.isBefore(db) || da == db) walkFwd(da, db) else -walkFwd(db, da)
    }
    val rows = ord.flatMap { case (ok, od) =>
      fs.get(ok).map(s0 => (od.take(7), walk(od, s0)))
    }
    val exp = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (ym, rs) =>
      (ym, rs.length.toLong, rnd(rs.map(_._2).sum.toDouble / rs.length, 6), rs.map(_._2).max)
    }
    val got = Registry.byName("q_time_28_bizdays").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_priv_8_reid_risk: risk terms replicate") {
    val g = cust.groupBy(c => (c._2, c._3)).view.mapValues(_.size.toLong).toSeq
    val exp = g.map(_._1._1).distinct.sorted.map { nk =>
      val ks = g.filter(_._1._1 == nk).map(_._2)
      (nk.toLong, ks.length.toLong, ks.count(_ == 1L).toLong,
        math.floor(ks.map(k => 1000000000L / k).sum.toDouble / 1000 + 0.5) / 1000000,
        (1000000L / ks.min).toDouble / 1000000)
    }
    val got = Registry.byName("q_priv_8_reid_risk").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_ret_11_rbp: geometric-discount sum replicates") {
    val w = (1 to 20).map(r => math.floor(1e8 * 0.2 * math.pow(0.8, r - 1) + 0.5).toLong)
    val exp = docs.map(_._4).distinct.sorted.map { src =>
      val ranked = docs.filter(_._4 == src)
        .sortBy(d => (-d._5, d._1))
        .zipWithIndex.map { case (d, i) => (i + 1, d._3 == "en") }
      val hits = ranked.filter(r => r._2 && r._1 <= 20)
      (src, hits.length.toLong,
        math.floor(hits.map(r => w(r._1 - 1)).sum.toDouble / 100 + 0.5) / 1000000)
    }
    val got = Registry.byName("q_ret_11_rbp").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == exp.toSeq)
    assert(got.exists(_._3 > 0), "at least one source must have relevant docs in top-20")
  }

  test("q_sub_8_having_agg: cross-product HAVING equals division semantics") {
    val b2 = cust.map(c => (c._3, c2(c._4)))
    val all = b2.map(_._2).sum.toDouble / b2.length
    val exp = b2.map(_._1).distinct.sorted.flatMap { sg =>
      val xs = b2.filter(_._1 == sg).map(_._2)
      val mean = xs.sum.toDouble / xs.length
      if (mean > all)
        Some((sg, xs.length.toLong, rnd(xs.sum.toDouble / 100 / xs.length, 6)))
      else None
    }
    val got = Registry.byName("q_sub_8_having_agg").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == exp.toSeq)
    assert(got.nonEmpty && got.length < 5, "HAVING must actually filter")
  }

  test("q_map_6_vocab_drift: map-HOF overlap equals multiset brute force") {
    def counts(src: String) = docs.filter(_._4 == src)
      .flatMap(_._2.split(" ", -1)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (a, b) = (counts("src0"), counts("src1"))
    val shared = a.keySet & b.keySet
    val got = Registry.byName("q_map_6_vocab_drift").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == shared.size.toLong)
    assert(got.getLong(1) == (a.keySet -- b.keySet).size.toLong)
    assert(got.getLong(2) == (b.keySet -- a.keySet).size.toLong)
    assert(got.getLong(3) == shared.toSeq.map(k => math.abs(a(k) - b(k))).sum)
    assert(shared.nonEmpty, "fixture sources must share vocabulary")
  }
}
