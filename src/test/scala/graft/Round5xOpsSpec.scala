package graft

import org.apache.spark.sql.functions._

/** Round-5x operators: brute-force Scala replications over collected
  * sf0.001 fixtures, plus the algebraic laws the queries pin.
  */
class Round5xOpsSpec extends SparkSpec {

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type",
        "CAST(get_json_object(props, '$.k') AS LONG) AS k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))

  test("q_join_20_null_safe: null-safe minus strict equals the null-key count") {
    val row = Registry.byName("q_join_20_null_safe").fn(spark, sf).collect().head
    val (ns, st, nk) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(ns - st == nk)
    val expected = events.filter(_._1 % 7 == 0)
      .map(e => if (e._4 == "error") None else Some(e._5 % 10))
    assert(nk == expected.count(_.isEmpty))
    // each non-null key matches exactly one bucket; each null matches the null bucket
    assert(ns == expected.length)
  }

  test("q_dq_30_inversions: pairwise counts replicate") {
    val sample = events.filter(_._3 % 10 == 0)
    val byUser = sample.groupBy(_._3)
    val expected = byUser.view.mapValues { es =>
      val pairs = for {
        a <- es; b <- es if a._1 < b._1
        if a._2 > b._2 || (a._2 == b._2 && a._1 > b._1)
      } yield 1
      (es.length.toLong, pairs.size.toLong)
    }.toMap
    val got = Registry.byName("q_dq_30_inversions").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (u, n, inv) =>
      val (en, einv) = expected(u)
      assert(n == en && inv == einv, s"user $u")
    }
    assert(got.nonEmpty)
  }

  test("q_set_7_multiset_identity: the conservation law holds for every type") {
    val rows = Registry.byName("q_set_7_multiset_identity").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 5)
    rows.foreach { case (t, na, ia, ea, holds) =>
      assert(holds == 1L, s"identity broken for $t")
      assert(na == ia + ea, s"$t: $na != $ia + $ea")
    }
  }

  test("q_proj_9_decimal_exact: decimal strings carry exactly two fraction digits") {
    val rows = Registry.byName("q_proj_9_decimal_exact").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, dec, n) =>
      assert(dec.matches("""-?\d+\.\d{2}"""), s"$p: $dec not scale-2")
      assert(n > 0)
    }
    // the decimal total equals the cents-sum within one half-up per row
    val cents = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(r =>
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum).toMap
    rows.foreach { case (p, dec, _) =>
      assert(BigDecimal(dec) == cents(p), s"$p: $dec != ${cents(p)}")
    }
  }

  test("q_time_17_gap_stats: run-length histogram replicates") {
    val days = events.filter(_._4 == "purchase").map(_._2 / 3600000000L).distinct.sorted.toSeq
    val gaps = days.zip(days.tail).collect { case (a, b) if b - a - 1 > 0 => b - a - 1 }
    val expected = gaps.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Registry.byName("q_time_17_gap_stats").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
