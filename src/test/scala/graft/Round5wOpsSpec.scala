package graft

import org.apache.spark.sql.functions._

/** Round-5w operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5wOpsSpec extends SparkSpec {

  private lazy val docs =
    graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q_text_46_ttr_length: quantized-TTR correlation replicates and is negative (Heaps)") {
    val q = docs.map { d =>
      val toks = d._2.split(" ")
      (d._3, toks.length.toLong,
        math.floor(toks.distinct.length.toDouble / toks.length * 1e6 + 0.5).toLong)
    }
    val expected = q.groupBy(_._1).view.mapValues { xs =>
      val n = xs.length.toLong
      val sx = xs.map(_._2).sum; val sy = xs.map(_._3).sum
      val sxx = xs.map(x => x._2 * x._2).sum; val syy = xs.map(x => x._3 * x._3).sum
      val sxy = xs.map(x => x._2 * x._3).sum
      math.floor((n.toDouble * sxy - sx.toDouble * sy)
        / math.sqrt((n.toDouble * sxx - sx.toDouble * sx) * (n.toDouble * syy - sy.toDouble * sy))
        * 1e6 + 0.5) / 1e6
    }.toMap
    val got = Registry.byName("q_text_46_ttr_length").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
    // longer documents repeat vocabulary: the confound shows as r < 0
    assert(got.values.forall(_ < 0.2))
  }

  test("q_text_47_word_len: histogram + mean replicate; shares sum to 1 per language") {
    val w = docs.flatMap(d => d._2.split(" ").map(t => (d._3, math.min(t.length, 10).toLong)))
    val h = w.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = w.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val sums = w.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = Registry.byName("q_text_47_word_len").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    got.foreach { case (lang, wl, n, share, mean) =>
      assert(h((lang, wl)) == n, s"$lang/$wl")
      assert(share == math.floor(n.toDouble / tot(lang) * 1e6 + 0.5) / 1e6)
      assert(mean == math.floor(sums(lang).toDouble / tot(lang) * 1e4 + 0.5) / 1e4)
    }
    got.groupBy(_._1).values.foreach { rows =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  test("q_agg_38_weighted_var: dollar-weighted moments replicate; var >= 0") {
    val rows = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong,
        r.getDouble(2).toLong))
    val expected = rows.groupBy(_._1).view.mapValues { ls =>
      val ws = ls.map(_._2).sum
      val swx = ls.map(l => l._2 * l._3).sum
      val swxx = ls.map(l => l._2 * l._3 * l._3).sum
      val mean = swx.toDouble / ws
      (math.floor(mean * 1e4 + 0.5) / 1e4,
        math.floor((swxx.toDouble / ws - mean * mean) * 1e4 + 0.5) / 1e4)
    }.toMap
    val got = Registry.byName("q_agg_38_weighted_var").fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == expected)
    assert(got.values.forall(_._2 >= 0))
  }

  test("q_sub_5_exists_agg: integer cross-product threshold replicates") {
    val orders = graft.sources.Tables(spark, sf, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val byCust = orders.groupBy(_._1)
    val hits = byCust.collect { case (ck, os)
      if os.exists(o => o._2 * os.length > os.map(_._2).sum) => ck
    }.toSet
    val custs = graft.sources.Tables(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val expected = custs.groupBy(_._2).view.mapValues { cs =>
      (cs.size.toLong, cs.count(c => hits(c._1)).toLong)
    }.toMap
    val got = Registry.byName("q_sub_5_exists_agg").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    // a customer with >= 2 distinct order values always has one above mean
    got.values.foreach { case (n, above) => assert(above <= n) }
  }

  test("q_win_22_ytd_share: cumulative share is monotone per year, December = 1") {
    val rows = Registry.byName("q_win_22_ytd_share").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    rows.groupBy(_._1).values.foreach { yr =>
      val sorted = yr.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
      // the last month present in the year reaches share 1
      assert(math.abs(sorted.last._4 - 1.0) < 1e-5)
    }
    assert(rows.nonEmpty)
  }
}
