package graft

import org.apache.spark.sql.functions._

/** Round-7i operators: brute-force replications on sf0.001. */
class Round7iOpsSpec extends SparkSpec {

  test("q_pipe_10_decontam_cost: flags replicate the trigram-overlap screen; non-vacuous") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "source", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val bench = docs.filter(_._1 < 5).flatMap(d => shingles(d._3)).toSet
    val train = docs.filter(_._1 >= 5)
    val flagged = train.filter { d =>
      val sh = shingles(d._3)
      sh.nonEmpty && sh.count(bench).toDouble / sh.size > 0.05
    }.map(_._1).toSet
    assert(flagged.nonEmpty, "screen must be non-vacuous at sf0.001")
    val exp = train.groupBy(_._2).view.mapValues { ds =>
      (ds.size.toLong, ds.count(d => flagged(d._1)).toLong,
        ds.map(_._4 / 5).sum, ds.filter(d => flagged(d._1)).map(_._4 / 5).sum)
    }.toMap
    val rows = Registry.byName("q_pipe_10_decontam_cost").fn(spark, sf).collect()
    rows.foreach { r =>
      val (n, fl, tt, tl) = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((n, fl, tt, tl)),
        s"source ${r.getString(0)}")
    }
  }

  test("q_stream_40_bot_screen: integer rules replicate; screen non-vacuous") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byUser = ev.groupBy(_._1)
    val flags = byUser.map { case (_, es) =>
      val mins = es.map(_._2 / 60000000L)
      val perMin = mins.groupBy(identity).view.mapValues(_.size).toMap
      val n = es.length.toLong
      val m = perMin.size.toLong
      val nNight = es.count(e => (e._2 / 3600000000L) % 24 < 6).toLong
      (if (n >= 75) 1 else 0, if (100 * n > 101 * m) 1 else 0,
        if (perMin.values.max >= 2) 1 else 0, if (10 * nNight > 3 * n) 1 else 0)
    }.toSeq
    val r = Registry.byName("q_stream_40_bot_screen").fn(spark, sf).collect().head
    assert(r.getLong(0) == flags.length.toLong)
    assert(r.getLong(1) == flags.map(_._1).sum.toLong)
    assert(r.getLong(2) == flags.map(_._2).sum.toLong)
    assert(r.getLong(3) == flags.map(_._3).sum.toLong)
    assert(r.getLong(4) == flags.map(_._4).sum.toLong)
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) > 0)
  }

  test("q_time_24_month_norm: both rankings are permutations; rate rank uses calendar days") {
    val rows = Registry.byName("q_time_24_month_norm").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = rows.length
    assert(rows.map(_._5).sorted.toSeq == (1L to n).toSeq)
    assert(rows.map(_._6).sorted.toSeq == (1L to n).toSeq)
    rows.foreach { case (ym, cd, _, _, rr, ra, shift) =>
      val month = (ym % 100).toInt
      val expDays = month match {
        case 1 | 3 | 5 | 7 | 8 | 10 | 12 => Set(31L)
        case 4 | 6 | 9 | 11 => Set(30L)
        case 2 => Set(28L, 29L)
        case _ => Set.empty[Long]
      }
      assert(expDays(cd), s"ym=$ym cal_days=$cd")
      assert(shift == rr - ra)
    }
    // the normalization must actually reorder something across 7 years
    assert(rows.exists(_._7 != 0L), "rank shift everywhere zero — vacuous")
  }

  test("q_join_23_mark: existence flags replicate; mark join does not fan out") {
    val bigOrders = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") >= 45).select("l_orderkey")
      .collect().map(_.getLong(0)).toSet
    val orders = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = orders.groupBy(_._2).view.mapValues { os =>
      (os.size.toLong, os.count(o => bigOrders(o._1)).toLong)
    }.toMap
    val rows = Registry.byName("q_join_23_mark").fn(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == orders.length.toLong, "no row fan-out")
    rows.foreach { r =>
      val (n, big) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == big, s"prio ${r.getString(0)}")
    }
  }
}
