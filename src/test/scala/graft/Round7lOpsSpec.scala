package graft

import org.apache.spark.sql.functions._

/** Round-7l privacy depth + reliability estimators: brute-force
  * replications on sf0.001.
  */
class Round7lOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }

  private lazy val cust = graft.sources.Tables(spark, sf, "customer")
    .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
    .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))

  test("q_priv_6_tcloseness: per-group ordered EMD replicates; t bounded in [0,1]") {
    val banded = cust.map(c => ((c._1, c._2), math.floor(c._3 / 1000).toLong))
    val bands = banded.map(_._2).distinct.sorted
    val m = bands.length
    val nn = banded.length.toLong
    val globalCum = bands.map(b => banded.count(_._2 <= b).toLong)
    val exp = banded.groupBy(_._1).toSeq.sortBy(_._1).map { case ((nk, seg), rows) =>
      val n = rows.length.toLong
      val s9 = bands.zip(globalCum).map { case (b, cg) =>
        val ck = rows.count(_._2 <= b).toLong
        math.floor(math.abs(ck.toDouble / n - cg.toDouble / nn) * 1e9 + 0.5).toLong
      }.sum
      (nk, seg, n, rnd(s9.toDouble / 1e9 / (m - 1), 6))
    }
    val got = Registry.byName("q_priv_6_tcloseness").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == exp)
    val t = got.map(_._4).max
    assert(t > 0.0 && t <= 1.0)
  }

  test("q_priv_7_dp_budget: usability thresholds replicate per epsilon") {
    val groups = cust.groupBy(c => (c._1, c._2)).view.mapValues(_.length.toLong).toMap
    val eps = Seq(0.1, 0.5, 1.0, 2.0)
    val exp = eps.map { e =>
      val usable = groups.values.count(n => 1.0 / (e * n) <= 0.05).toLong
      (e, groups.size.toLong, usable,
        rnd(usable.toDouble / groups.size, 6),
        math.ceil(20.0 / e).toLong, rnd(groups.size / e, 4))
    }
    val got = Registry.byName("q_priv_7_dp_budget").fn(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == exp)
    // monotone: a bigger budget can only widen the usable set
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted)
  }

  test("q_stat_43_nelson_aalen: hazard increments ride the KM risk sets; H is nondecreasing") {
    val km = Registry.byName("q_stat_7_survival").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val na = Registry.byName("q_stat_43_nelson_aalen").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // identical event times, death counts, and risk sets as Kaplan–Meier
    assert(na.map(t => (t._1, t._2, t._3)).toSeq == km.toSeq)
    // H replicates as the prefix sum of quantized d/n increments
    var acc = 0L
    val exp = na.map { case (_, d, n, _) =>
      acc += math.floor(d.toDouble / n * 1e6 + 0.5).toLong
      acc.toDouble / 1e6
    }
    assert(na.map(_._4).toSeq == exp.toSeq)
    assert(na.map(_._4).toSeq == na.map(_._4).sorted.toSeq)
  }

  test("q_stream_41_littles_law: L/(lambda*W) telescopes to sum(overlap)/sum(lag)") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(max(datediff(col("l_shipdate"), lit("1970-01-01"))).as("d1"))
    val sp = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), datediff(col("o_orderdate"), lit("1970-01-01")).as("d0"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .join(li, col("o_orderkey") === col("l_orderkey")).collect()
      .map(r => (r.getInt(1).toLong, r.getString(2), r.getInt(4).toLong))
    val months = sp.map(_._2).distinct.sorted
    def bounds(ym: String): (Long, Long) = {
      val Array(y, m) = ym.split("-").map(_.toInt)
      val start = java.time.LocalDate.of(y, m, 1).toEpochDay
      val end = java.time.LocalDate.of(y, m, 1).plusMonths(1).toEpochDay
      (start, end)
    }
    val got = Registry.byName("q_stream_41_littles_law").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val expRows = months.flatMap { ym =>
      val (ms, me) = bounds(ym)
      val arrivals = sp.filter(_._2 == ym)
      val sumLag = arrivals.map(a => a._3 - a._1).sum
      if (arrivals.isEmpty || sumLag <= 0) None else {
        val od = sp.map { case (d0, _, d1) =>
          val o = math.min(d1, me) - math.max(d0, ms); if (o > 0) o else 0L
        }.sum
        Some((ym, arrivals.length.toLong,
          rnd(arrivals.length.toDouble / (me - ms), 4),
          rnd(sumLag.toDouble / arrivals.length, 4),
          rnd(od.toDouble / (me - ms), 4),
          rnd(od.toDouble / sumLag, 4)))
      }
    }
    assert(got.toSeq == expRows.toSeq)
    // interior months of a stationary generator sit near ratio 1
    val interior = got.drop(1).dropRight(1).map(_._6)
    assert(interior.nonEmpty && interior.exists(r => r > 0.5 && r < 2.0))
  }
}
