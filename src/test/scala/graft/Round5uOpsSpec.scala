package graft

import org.apache.spark.sql.functions._

/** Round-5u operators: brute-force Scala replications of the indicator
  * and R/S cores over the collected sf0.001 daily series.
  */
class Round5uOpsSpec extends SparkSpec {

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("event_id", "unix_micros(ts) AS us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  private lazy val dailyCents: Seq[(Long, Long)] =
    events.groupBy(_._2 / 86400000000L).view
      .mapValues(_.map(e => math.floor(e._3 * 100 + 0.5).toLong).sum)
      .toSeq.sortBy(_._1)

  test("q_win_19_macd: sequential EMA folds over quantized series replicate") {
    val vals = dailyCents.map(_._2.toDouble)
    def ema(xs: Seq[Double], alpha: Double): Double =
      xs.tail.foldLeft(xs.head)((a, x) => (1 - alpha) * a + alpha * x)
    val macd6 = vals.indices.map { i =>
      val prefix = vals.take(i + 1)
      math.floor((ema(prefix, 2.0 / 13) - ema(prefix, 2.0 / 27)) / 100 * 1e6 + 0.5).toLong
    }
    val sig4 = macd6.indices.map { i =>
      val ms = macd6.take(i + 1).map(_.toDouble / 1e6)
      math.floor(ms.tail.foldLeft(ms.head)((a, x) => 0.8 * a + 0.2 * x) * 1e4 + 0.5).toLong
    }
    val n = vals.length
    val expected = ((n - 30) until n).map { i =>
      (dailyCents(i)._1, macd6(i) / 1e6, sig4(i) / 1e4,
        math.floor((macd6(i) / 1e6 - sig4(i) / 1e4) * 1e4 + 0.5) / 1e4)
    }
    val got = Registry.byName("q_win_19_macd").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == expected)
  }

  test("q_win_20_atr_keltner: integer TR/ATR replicate; band brackets the typical price") {
    val bars = events.groupBy(_._2 / 86400000000L).view.mapValues { es =>
      val cs = es.sortBy(e => (e._2, e._1)).map(e => math.floor(e._3 * 100 + 0.5).toLong)
      (cs.max, cs.min, cs.last)
    }.toSeq.sortBy(_._1)
    val trs = bars.zipWithIndex.map { case ((d, (hi, lo, cl)), i) =>
      if (i == 0) (d, None)
      else {
        val pc = bars(i - 1)._2._3
        (d, Some(Seq(hi - lo, math.abs(hi - pc), math.abs(lo - pc)).max))
      }
    }
    val got = Registry.byName("q_win_20_atr_keltner").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    got.foreach { case (day, atr, khi, klo) =>
      val idx = trs.indexWhere(_._1 == day)
      val window = trs.slice(idx - 6, idx + 1).flatMap(_._2)
      assert(window.length == 7, s"day $day window incomplete")
      val atrC = window.sum.toDouble / 7
      assert(atr == math.floor(atrC / 100 * 100 + 0.5) / 100, s"day $day atr")
      val (hi, lo, cl) = bars.find(_._1 == day).get._2
      val typ = (hi + lo + cl).toDouble / 3
      assert(khi == math.floor((typ + 1.5 * atrC) / 100 * 100 + 0.5) / 100)
      assert(klo == math.floor((typ - 1.5 * atrC) / 100 * 100 + 0.5) / 100)
      assert(khi >= klo)
    }
    assert(got.nonEmpty)
  }

  test("q_win_21_rolling_kurt: power-sum kurtosis replicates on the kilodollar grid") {
    val v = dailyCents.map { case (d, c) => (d, math.floor(c / 100000.0 + 0.5).toLong) }
    val got = Registry.byName("q_win_21_rolling_kurt").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    got.foreach { case (day, kurt) =>
      val i = v.indexWhere(_._1 == day)
      val w = v.slice(i - 13, i + 1).map(_._2)
      assert(w.length == 14)
      val k = 14.0
      val s1 = w.sum.toDouble; val s2 = w.map(x => x * x).sum.toDouble
      val s3 = w.map(x => x * x * x).sum.toDouble; val s4 = w.map(x => x * x * x * x).sum.toDouble
      val m4 = s4 - 4 * s1 * s3 / k + 6 * s1 * s1 * s2 / (k * k) - 3 * s1 * s1 * s1 * s1 / (k * k * k)
      val m2 = s2 - s1 * s1 / k
      assert(kurt == math.floor(k * m4 / (m2 * m2) * 1e4 + 0.5) / 1e4, s"day $day")
    }
    assert(got.nonEmpty)
  }

  test("q_time_15_hurst: block R/S replicates; hurst in a sane band") {
    val ys = dailyCents.map(_._2)
    def meanRs6(w: Int): Long = {
      val blocks = ys.grouped(w).filter(_.length == w).toSeq
      val rs6 = blocks.map { b =>
        val k = w.toLong; val s1 = b.sum; val s2 = b.map(y => y * y).sum
        val cums = b.scanLeft(0L)(_ + _).tail.zipWithIndex.map { case (p, i) =>
          k * p - (i + 1).toLong * s1
        }
        math.floor((cums.max - cums.min).toDouble
          / math.sqrt(k.toDouble * s2 - s1.toDouble * s1) * 1e6 + 0.5).toLong
      }
      math.floor(rs6.sum.toDouble / rs6.length + 0.5).toLong
    }
    val row = Registry.byName("q_time_15_hurst").fn(spark, sf).collect().head
    assert(row.getDouble(0) == meanRs6(4) / 1e6)
    assert(row.getDouble(1) == meanRs6(8) / 1e6)
    assert(row.getDouble(2) == meanRs6(16) / 1e6)
    val h = row.getDouble(3)
    assert(h == math.floor((math.log(meanRs6(16) / 1e6) - math.log(meanRs6(4) / 1e6))
      / math.log(4.0) * 1e4 + 0.5) / 1e4)
    // R/S grows with block size; H within the physically meaningful band
    assert(row.getDouble(2) > row.getDouble(0))
    assert(h > 0 && h < 1.2)
  }

  test("q_time_16_decomp: shares sum to ~1 and are each in [-0.1, 1.1]") {
    val row = Registry.byName("q_time_16_decomp").fn(spark, sf).collect().head
    val (t, se, r) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    // trend_share = 1 - detrended/SST; seasonal + remainder = detrended/SST
    assert(math.abs(t + se + r - 1.0) < 1e-4)
    Seq(t, se, r).foreach(x => assert(x > -0.1 && x < 1.1, s"share $x out of band"))
    // seasonal share can't be negative by construction beyond rounding
    assert(se > -1e-3)
  }
}
