package graft

/** Round-7r estimator wave two: brute-force replications on sf0.001. */
class Round7rOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }
  private def c2(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  private lazy val ord = {
    import org.apache.spark.sql.functions.{col, date_format}
    graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
  }

  private lazy val monthly: Seq[(String, Long)] =
    ord.groupBy(_._4).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)

  test("q_stat_45_ansari_bradley: end-in scores replicate") {
    val p = ord.filter(o => o._2 == "1-URGENT" || o._2 == "5-LOW")
      .map(o => (if (o._2 == "1-URGENT") 1 else 0, c2(o._3), o._1))
      .sortBy(r => (r._2, r._3))
    val nn = p.length.toLong
    val scored = p.zipWithIndex.map { case ((g, _, _), i) =>
      (g, math.min(i + 1L, nn - i))
    }
    val n1 = scored.count(_._1 == 1).toLong
    val ab = scored.filter(_._1 == 1).map(_._2).sum
    val eAb = if (nn % 2 == 0) n1.toDouble * (nn + 2) / 4
      else n1.toDouble * (nn + 1) * (nn + 1) / (4 * nn)
    val got = Registry.byName("q_stat_45_ansari_bradley").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == n1)
    assert(got.getLong(1) == nn - n1)
    assert(got.getLong(2) == ab)
    assert(got.getDouble(3) == rnd(eAb, 6))
  }

  test("q_stat_46_kendall_tau_b: pair classes replicate") {
    val m = monthly.map { case (ym, x) =>
      val cents = ord.filter(_._4 == ym).map(o => c2(o._3)).sum
      (ym, x, cents / x)
    }
    var (nc, nd, tx, ty, n0) = (0L, 0L, 0L, 0L, 0L)
    for (i <- m.indices; j <- m.indices if m(i)._1 < m(j)._1) {
      n0 += 1
      val (x1, y1, x2, y2) = (m(i)._2, m(i)._3, m(j)._2, m(j)._3)
      if ((x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2)) nc += 1
      else if ((x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2)) nd += 1
      if (x1 == x2 && y1 != y2) tx += 1
      if (y1 == y2 && x1 != x2) ty += 1
    }
    val tauB = rnd((nc - nd).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty)), 6)
    val got = Registry.byName("q_stat_46_kendall_tau_b").fn(spark, sf).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      == ((nc, nd, tx, ty, n0)))
    assert(got.getDouble(5) == tauB)
  }

  test("q_ml_14_mase: scaled errors replicate") {
    val xs = monthly.map(_._2)
    val scored = (3 until xs.length).map { t =>
      (math.abs(3 * xs(t) - (xs(t - 1) + xs(t - 2) + xs(t - 3))),
        math.abs(3 * xs(t) - 3 * xs(t - 1)))
    }
    val got = Registry.byName("q_ml_14_mase").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == scored.length.toLong)
    assert(got.getLong(1) == scored.map(_._1).sum)
    assert(got.getLong(2) == scored.map(_._2).sum)
    assert(got.getDouble(3) ==
      rnd(scored.map(_._1).sum.toDouble / scored.map(_._2).sum, 6))
  }

  test("q_agg_45_percentile_disc_cont: DISC is a rank pick, CONT interpolates") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong))
    val exp = li.map(_._1).distinct.sorted.map { rf =>
      val qs = li.filter(_._1 == rf).map(_._2).sorted
      val n = qs.length
      val disc = qs((n + 3) / 4 - 1)
      val pos = 0.25 * (n - 1)
      val (lo, hi) = (qs(pos.toInt), qs(math.ceil(pos).toInt))
      val cont = rnd(lo + (pos - pos.toInt) * (hi - lo), 6)
      (rf, disc, cont, if (disc.toDouble == cont) 0L else 1L)
    }
    val got = Registry.byName("q_agg_45_percentile_disc_cont").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_arr_7_entity_spine: span/coverage replicate") {
    import org.apache.spark.sql.functions.{col, date_format}
    val oc = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def monthIdx(ym: String): Int = ym.take(4).toInt * 12 + ym.drop(5).toInt
    val exp = oc.groupBy(_._1).toSeq.sortBy(_._1).map { case (ck, rs) =>
      val ms = rs.map(_._2).distinct
      val span = monthIdx(ms.max) - monthIdx(ms.min) + 1L
      (ck, span, ms.length.toLong, rnd(ms.length.toDouble / span, 6))
    }
    val got = Registry.byName("q_arr_7_entity_spine").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == exp.toSeq)
    assert(got.exists(_._4 < 1.0), "some customer must have gap months")
  }
}
