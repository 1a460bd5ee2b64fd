package graft

import org.apache.spark.sql.functions._

/** Round-5v operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5vOpsSpec extends SparkSpec {

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("q_stream_27_rfm: segment populations cover all purchasers; scores in 1..5") {
    val rows = Registry.byName("q_stream_27_rfm").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val purchasers = events.filter(_._4 == "purchase").map(_._3).distinct.length.toLong
    assert(rows.map(_._4).sum == purchasers)
    rows.foreach { case (r, f, m, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // each axis marginal is a valid ntile partition (sizes differ by <= 1)
    val rMarg = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).values.toSeq
    assert(rMarg.max - rMarg.min <= 1)
  }

  test("q_dq_28_inclusion: synthetic star is fully referential (containment = 1.0)") {
    val rows = Registry.byName("q_dq_28_inclusion").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 4)
    rows.foreach { case (fk, nd, nc, cont) =>
      assert(nc <= nd, fk)
      assert(cont == math.floor(nc.toDouble / nd * 1e6 + 0.5) / 1e6, fk)
    }
    // the fixtures are generated referentially intact
    assert(rows.forall(_._4 == 1.0))
  }

  test("q_dq_29_balance: bucket shares sum to 1; membership by integer cross-multiplication") {
    val rows = Registry.byName("q_dq_29_balance").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val totalShare = rows.map(_._3).sum
    assert(math.abs(totalShare - 1.0) < 1e-4)
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r =>
        math.floor(r.getDouble(1) * (1 - r.getDouble(2)) * 100 + 0.5).toLong).sum).toMap
    val buckets = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .flatMap { r =>
        li.get(r.getLong(0)).map { lc =>
          val oc = math.floor(r.getDouble(1) * 100 + 0.5).toLong
          val err = math.abs(oc - lc)
          if (100 * err <= oc) "within_1pct"
          else if (10 * err <= oc) "within_10pct"
          else if (2 * err <= oc) "within_50pct"
          else "over_50pct"
        }
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (b, n, _) => assert(buckets(b) == n, b) }
  }

  test("q_stream_28_stationary: both mixes are distributions; shift = stationary - observed") {
    val rows = Registry.byName("q_stream_28_stationary").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 5)
    // quantized distributions sum to ~1
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 2e-3)
    rows.foreach { case (_, obs, sta, shift) =>
      assert(math.abs(shift - math.floor((sta - obs) * 1e6 + 0.5) / 1e6) < 2e-6)
      assert(obs >= 0 && obs <= 1 && sta >= 0 && sta <= 1)
    }
  }

  test("q_stream_29_user_entropy: quantized-term entropy replicates; bounded by log2(5)") {
    val perUser = events.groupBy(_._3).view.mapValues { es =>
      val n = es.length.toLong
      es.groupBy(_._4).values.map { g =>
        val p = g.length.toDouble / n
        math.floor(-p * math.log(p) / math.log(2.0) * 1e6 + 0.5).toLong
      }.sum
    }.toMap
    val top = perUser.toSeq.sortBy { case (u, h) => (-h, u) }.take(10)
    val mean6 = math.floor(perUser.values.sum.toDouble / perUser.size + 0.5).toLong
    val got = Registry.byName("q_stream_29_user_entropy").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(r => (r._1, r._2)).toSeq == top.map { case (u, h) => (u, h / 1e6) })
    assert(got.forall(_._3 == mean6 / 1e6))
    assert(got.forall(_._2 <= math.log(5.0) / math.log(2.0) + 1e-4))
  }
}
