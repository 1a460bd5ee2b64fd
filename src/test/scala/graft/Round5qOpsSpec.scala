package graft

import org.apache.spark.sql.functions._

/** Round-5q operators: brute-force Scala replications of the inference
  * statistics over collected sf0.001 fixtures.
  */
class Round5qOpsSpec extends SparkSpec {

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private lazy val custCents =
    graft.sources.Tables(spark, sf, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))

  test("q_stat_24_partial_corr: Durbin-style formula over quantized pairwise r replicates") {
    val rows = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong, math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val expected = rows.groupBy(_._1).view.mapValues { ls =>
      val n = ls.length.toLong
      def s(f: ((String, Long, Long, Long)) => Long) = ls.map(f).sum
      val (sx, sy, sz) = (s(_._2), s(_._3), s(_._4))
      val (sxx, syy, szz) = (s(l => l._2 * l._2), s(l => l._3 * l._3), s(l => l._4 * l._4))
      val (sxy, sxz, syz) = (s(l => l._2 * l._3), s(l => l._2 * l._4), s(l => l._3 * l._4))
      def c6(sab: Long, a: Long, b: Long, saa: Long, sbb: Long) =
        math.floor((n.toDouble * sab - a.toDouble * b)
          / math.sqrt((n.toDouble * saa - a.toDouble * a) * (n.toDouble * sbb - b.toDouble * b))
          * 1e6 + 0.5) / 1e6
      val (rxy, rxz, ryz) =
        (c6(sxy, sx, sy, sxx, syy), c6(sxz, sx, sz, sxx, szz), c6(syz, sy, sz, syy, szz))
      (rxy, q6((rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))))
    }.toMap
    val got = Registry.byName("q_stat_24_partial_corr").fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("q_stat_25_bh_fdr: rejected set = BH step-up on integer-compared Chebyshev p-values") {
    val rows = Registry.byName("q_stat_25_bh_fdr").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    // p-values are valid probabilities and sorted ascending in rank order
    assert(rows.map(_._2).forall(p => p > 0 && p <= 1))
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    // BH coherence: rejections form a prefix of the sorted p order
    val flags = rows.map(_._3)
    val lastReject = flags.lastIndexOf(1L)
    assert(flags.take(lastReject + 1).forall(_ == 1L))
    // every rejected p satisfies its own threshold OR is dominated by a
    // later k that does (step-up property)
    val m = rows.length
    rows.zipWithIndex.foreach { case ((_, p, rej), i) =>
      if (rej == 1L) {
        val someLater = rows.zipWithIndex.drop(i).exists { case ((_, p2, _), j) =>
          math.floor(p2 * 1e6 + 0.5) * 250 <= (j + 1).toLong * 1000000L
        }
        assert(someLater, s"rejected rank ${i + 1} (p=$p) has no qualifying later rank")
      }
    }
    assert(m == 25)
  }

  test("q_stat_26_mcnemar: 2x2 table over per-user half-window high-value flags") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .selectExpr("user_id", "event_type", "value", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val lohi = ev.map(_._4).min + ev.map(_._4).max
    val users = ev.map(_._1).distinct
    val flags = users.map { u =>
      val mine = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 > 100)
      (mine.exists(_._4 * 2 < lohi), mine.exists(_._4 * 2 >= lohi))
    }
    val b = flags.count(f => !f._1 && f._2).toLong
    val c = flags.count(f => f._1 && !f._2).toLong
    val row = Registry.byName("q_stat_26_mcnemar").fn(spark, sf).collect().head
    assert(row.getLong(1) == b && row.getLong(2) == c)
    val chi2 = if (b + c == 0) 0.0
    else math.floor((b - c).toDouble * (b - c) / (b + c) * 1e4 + 0.5) / 1e4
    assert(row.getDouble(4) == chi2)
  }

  test("q_stat_27_grubbs: argmax on exact integer deviation; G replicates") {
    val expected = custCents.groupBy(_._2).map { case (nk, cs) =>
      val n = cs.length.toLong
      val s = cs.map(_._3).sum
      val ss = cs.map(c => c._3 * c._3).sum
      val top = cs.map(c => (math.abs(n * c._3 - s), c._1)).sortBy(t => (-t._1, t._2)).head
      val sd = math.sqrt((ss.toDouble * n - s.toDouble * s) / (n.toDouble * n * (n - 1)))
      nk.toLong -> ((top._2, q6(top._1.toDouble / n / sd / n)))
    }
    val got = Registry.byName("q_stat_27_grubbs").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("q_stat_28_bootstrap_ci: ci_lo <= mean_all <= ci_hi and exact hash membership") {
    val row = Registry.byName("q_stat_28_bootstrap_ci").fn(spark, sf).collect().head
    val (mean, lo, hi) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(lo <= hi)
    // the point estimate sits inside the half-sample CI on this data
    assert(lo <= mean && mean <= hi)
    // replicate 1 membership replicates the hash arithmetic exactly
    val P = 1000000007L
    val orders = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val inRep1 = orders.filter { case (k, _) => ((k + 131) % P) * 2654435761L % P < P / 2 }
    assert(inRep1.nonEmpty && inRep1.length < orders.length)
  }

  test("q_stat_29_bartlett: T >= 0 and k = 3; variance-homogeneous data stays small") {
    val row = Registry.byName("q_stat_29_bartlett").fn(spark, sf).collect().head
    assert(row.getLong(0) == 3)
    assert(row.getDouble(1) >= 0.0)
  }

  test("q_stat_30_influence: leverage in (0,1); top-10 sorted by cooks_d desc") {
    val rows = Registry.byName("q_stat_30_influence").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(r => r._2 > 0 && r._2 < 1))
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // leverage is minimized mid-window: the top-influence day is not
    // required to be an edge, but every h_i >= 1/n
    val n = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("unix_micros(ts) div 86400000000 AS d").distinct().count()
    assert(rows.forall(_._2 >= 1.0 / n - 1e-9))
  }
}
