package graft

/** Round-7n thin-family depth wave: brute-force replications on sf0.001. */
class Round7nOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }
  private def c2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
  private def mh(k: Long): Long =
    (math.floorMod(k, 1000000007L) * 2654435761L) % 1000000007L

  private lazy val ord = {
    import org.apache.spark.sql.functions.{col, date_format}
    graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
  }

  private lazy val cust = graft.sources.Tables(spark, sf, "customer")
    .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "text", "source", "n_chars").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("q_sort_7_mixed_dirs: rank replicates the mixed-direction brute-force sort") {
    val lastYm = ord.groupBy(_._2).view.mapValues(_.map(_._3.take(7)).max).toMap
    val exp = cust
      .map { case (ck, _, bal) => (ck, lastYm.get(ck), c2(bal)) }
      .sortBy { case (ck, ym, b2) => (ym.isEmpty, ym.map(y => invert(y)), b2, ck) }
      .take(100)
      .zipWithIndex
      .map { case ((ck, ym, b2), i) =>
        (i + 1, ck, ym.getOrElse("never"), b2.toDouble / 100) }
    val got = Registry.byName("q_sort_7_mixed_dirs").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq == exp.toSeq)
  }

  /** Map a yyyy-MM string to a tuple that sorts ASCENDING when the
    * original sorts DESCENDING (char-wise complement). */
  private def invert(ym: String): String = ym.map(c => (255 - c).toChar)

  test("q_filter_6_three_valued: branch counts partition the table") {
    val ds = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_discount").collect().map(_.getDouble(0))
    val dn = ds.map(x => if (x == 0.0) None else Some(x))
    val got = Registry.byName("q_filter_6_three_valued").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == ds.length.toLong)
    assert(got.getLong(1) == dn.count(_.exists(_ > 0.04)).toLong)
    assert(got.getLong(2) == dn.count(_.exists(_ <= 0.04)).toLong)
    assert(got.getLong(3) == dn.count(_.isEmpty).toLong)
    assert(got.getLong(4) == dn.count(v => v.isEmpty || v.exists(_ > 0.04)).toLong)
    assert(got.getLong(5) == 1L, "partition law must hold")
    assert(got.getLong(3) > 0, "nullif must produce some NULLs on the fixture")
  }

  test("q_arr_6_lines_profile: array profile equals rank-window brute force") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong))
    val exp = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (ok, rows) =>
      val qs = rows.map(_._2).sorted
      (ok, qs.length.toLong, qs.head, qs.last,
        qs.reverse.take(3).sum, if (qs.contains(50L)) 1L else 0L)
    }
    val got = Registry.byName("q_arr_6_lines_profile").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_ml_13_pinball: quantiles and losses replicate") {
    val seg = cust.map(c => c._1 -> c._2).toMap
    val j = ord.map(o => (seg(o._2), c2(o._4), mh(o._1) % 4, o._1))
    val exp = j.map(_._1).distinct.sorted.map { sg =>
      val tr = j.filter(r => r._1 == sg && r._3 < 3).sortBy(r => (r._2, r._4)).map(_._2)
      val n = tr.length
      val q50 = tr((n + 1) / 2 - 1)
      val q90 = tr((9 * n + 9) / 10 - 1)
      val te = j.filter(r => r._1 == sg && r._3 == 3).map(_._2)
      val l50 = te.map(y => math.max(5 * (y - q50), -5 * (y - q50))).sum
      val l90 = te.map(y => math.max(9 * (y - q90), -(y - q90))).sum
      (sg, te.length.toLong, q50.toDouble / 100, q90.toDouble / 100,
        rnd(l50.toDouble / 1000 / te.length, 6), rnd(l90.toDouble / 1000 / te.length, 6))
    }
    val got = Registry.byName("q_ml_13_pinball").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_pipe_11_token_ledger: four-stage funnel replicates") {
    val t = docs.map { case (id, text, src, _) =>
      val toks = text.split(" ", -1)
      (id, src, toks.length.toLong, toks.sorted.mkString(" "))
    }
    val q = t.filter(_._3 >= 20)
    val keep = q.groupBy(_._4).values.map(_.minBy(_._1)._1).toSet
    val exp = t.map(_._2).distinct.sorted.map { src =>
      val t0 = t.filter(_._2 == src)
      val t1 = q.filter(_._2 == src)
      val t2 = t1.filter(r => keep(r._1))
      (src, t0.length.toLong, t0.map(_._3).sum, t1.length.toLong, t1.map(_._3).sum,
        t2.length.toLong, t2.map(_._3).sum, t2.map(r => math.min(r._3, 96L)).sum)
    }
    val got = Registry.byName("q_pipe_11_token_ledger").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == exp.toSeq)
    assert(got.map(_._4).sum > 0, "quality stage must keep some docs")
  }

  test("q_udaf_4_bottomk: Aggregator output equals the hash-order head") {
    val exp = cust.map(_._2).distinct.sorted.flatMap { sg =>
      cust.filter(_._2 == sg).map(_._1).sortBy(k => (mh(k), k)).take(5)
        .zipWithIndex.map { case (ck, i) => (sg, (i + 1).toLong, ck) }
    }
    val got = Registry.byName("q_udaf_4_bottomk").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_udaf_4_bottomk: buffer merge is bounded and order-insensitive") {
    import graft.operators.Round7nOps.BottomK
    val ks = (1L to 200L).toArray
    val whole = ks.foldLeft(BottomK.zero)(BottomK.reduce)
    val (a, b) = ks.splitAt(67)
    val merged = BottomK.merge(
      a.foldLeft(BottomK.zero)(BottomK.reduce),
      b.reverse.foldLeft(BottomK.zero)(BottomK.reduce))
    assert(whole.ks.toSeq == merged.ks.toSeq)
    assert(merged.ks.length == 5)
  }

  test("q_mm_11_magic_sniff: sniffed formats recover the construction") {
    val exp = docs.map { case (id, text, _, nc) =>
      val payload = text.take((10 + nc % 50).toInt).getBytes("UTF-8").length.toLong
      val (fmt, magic) = (id % 3) match {
        case 0 => ("png", 8L); case 1 => ("riff", 4L); case _ => ("raw", 0L)
      }
      (fmt, id, magic + payload)
    }
    val expAgg = exp.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rs) =>
      (f, rs.length.toLong, rs.map(_._3).sum, rs.map(_._2).min)
    }
    val got = Registry.byName("q_mm_11_magic_sniff").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expAgg.toSeq)
    assert(got.map(_._1).toSet == Set("png", "riff", "raw"))
  }

  test("q_sink_5_range_files: 8 disjoint files covering every row") {
    val got = Registry.byName("q_sink_5_range_files").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == 8L)
    assert(got.getLong(1) == graft.sources.Tables(spark, sf, "orders").count())
    assert(got.getLong(2) == 0L, "range-clustered files must not overlap")
  }
}
