package graft

import org.apache.spark.sql.functions._

/** Round-5aa operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5aaOpsSpec extends SparkSpec {

  private lazy val events =
    graft.sources.Tables(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts) AS us", "user_id", "event_type",
        "CAST(get_json_object(props, '$.k') AS LONG) AS k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))

  test("q_stream_30_funnel_time: order-statistic picks replicate") {
    val byUser = events.groupBy(_._3)
    def firstOf(t: String, es: Array[(Long, Long, Long, String, Long)]): Option[Long] = {
      val f = es.filter(_._4 == t)
      if (f.isEmpty) None else Some(f.map(_._2).min)
    }
    val hops = Seq("view_to_click", "click_to_purchase").map { hop =>
      val gaps = byUser.values.flatMap { es =>
        val (a, b) = if (hop == "view_to_click") (firstOf("view", es), firstOf("click", es))
        else (firstOf("click", es), firstOf("purchase", es))
        for (x <- a; y <- b if y >= x) yield y - x
      }.toSeq.sorted
      hop -> gaps
    }.toMap
    val got = Registry.byName("q_stream_30_funnel_time").fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    hops.foreach { case (hop, gaps) =>
      val n = gaps.length
      val (gn, med, p90) = got(hop)
      assert(gn == n.toLong, hop)
      assert(med == gaps((n + 1) / 2 - 1) / 60000000L, s"$hop median")
      assert(p90 == gaps((9 * n + 9) / 10 - 1) / 60000000L, s"$hop p90")
    }
  }

  test("q_join_21_exists_or: widened semi join equals the union of the two EXISTS sets") {
    val orders = graft.sources.Tables(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderpriority", "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS us", "l_discount")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expected = orders.filter { o =>
      li.get(o._1).exists(_.exists(l =>
        l._2 > o._3 + 60L * 86400000000L || l._3 >= 0.09))
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = Registry.byName("q_join_21_exists_or").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q_sub_6_not_in_nulls: NULL poisons NOT IN; NOT EXISTS matches the filtered form") {
    val row = Registry.byName("q_sub_6_not_in_nulls").fn(spark, sf).collect().head
    val (poisoned, notExists, filtered) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(poisoned == 0L)
    assert(notExists == filtered)
    val ks = events.filter(_._4 != "error").map(_._5).toSet
    assert(notExists == (0L until 200L).count(v => !ks.contains(v)).toLong)
  }

  test("q_mm_10_byte_entropy: quantized-term entropy replicates; bounded by 8 bits") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .filter(col("doc_id") < 80).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val bytes = (0 until 256).map(i => text.charAt(i % text.length).toInt)
      val h6 = bytes.groupBy(identity).values.map { g =>
        val p = g.size.toDouble / 256
        math.floor(-p * math.log(p) / math.log(2.0) * 1e6 + 0.5).toLong
      }.sum
      id -> ((h6 / 1e6, bytes.distinct.length.toLong, if (h6 < 4000000L) 1L else 0L))
    }.toMap
    val got = Registry.byName("q_mm_10_byte_entropy").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    got.values.foreach { case (h, _, _) => assert(h >= 0 && h <= 8.0 + 1e-6) }
  }
}
