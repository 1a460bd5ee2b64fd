package graft

/** Round-7p edge-semantics wave: brute-force replications on sf0.001. */
class Round7pOpsSpec extends SparkSpec {

  private lazy val ord = {
    import org.apache.spark.sql.functions.{col, date_format}
    graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  private lazy val cust = graft.sources.Tables(spark, sf, "customer")
    .select("c_custkey", "c_mktsegment", "c_nationkey").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))

  test("q_udtf_4_explode_outer: outer generator equals LEFT JOIN brute force") {
    val months = ord.filter(_._3.take(4) == "1995")
      .map(o => (o._2, o._3.substring(5, 7).toInt)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = cust.map(_._2).distinct.sorted.map { sg =>
      val cs = cust.filter(_._2 == sg)
      val inner = cs.map(c => months.getOrElse(c._1, Set.empty).size.toLong).sum
      val silent = cs.count(c => !months.contains(c._1)).toLong
      (sg, inner + silent, inner, silent)
    }
    val got = Registry.byName("q_udtf_4_explode_outer").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
    assert(got.map(_._4).sum > 0, "some customers must be 1995-silent")
  }

  test("q_time_29_iso_week: ISO fields equal java.time WeekFields brute force") {
    val wf = java.time.temporal.WeekFields.ISO
    val exp = ord.map { o =>
      val dt = java.time.LocalDate.parse(o._3)
      (dt.get(wf.weekBasedYear()).toLong, dt.get(wf.weekOfWeekBasedYear()).toLong,
        dt.getYear.toLong)
    }
    val expAgg = exp.groupBy(e => (e._1, e._2)).toSeq.sortBy(_._1).map {
      case ((iy, iw), rs) => (iy, iw, rs.length.toLong, rs.count(r => r._1 != r._3).toLong)
    }
    val got = Registry.byName("q_time_29_iso_week").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expAgg.toSeq)
    assert(got.map(_._4).sum > 0, "fixture must have year-boundary ISO weeks")
  }

  test("q_scan_24_csv_quoting: zero mismatches, exact lengths") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val got = Registry.byName("q_scan_24_csv_quoting").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == docs.length.toLong)
    assert(got.getLong(1) == docs.map(t => 6L + math.min(30, t.length)).sum)
    assert(got.getLong(2) == 0L, "CSV round trip must be byte-exact")
  }

  test("q_stat_44_hodges_lehmann: HL equals the Walsh-average median brute force") {
    import org.apache.spark.sql.functions.{col, date_format}
    val op = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderpriority"), date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val exp = op.map(_._1).distinct.sorted.map { pr =>
      val xs = op.filter(_._1 == pr).groupBy(_._2).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val walsh = (for {
        (y1, x1) <- xs; (y2, x2) <- xs if y1 <= y2
      } yield (x1 + x2, y1, y2)).sortBy(identity)
      val pick = walsh((walsh.length + 1) / 2 - 1)._1
      (pr, pick.toDouble / 2, walsh.length.toLong)
    }
    val got = Registry.byName("q_stat_44_hodges_lehmann").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_filter_7_dynamic_in: semi join equals computed IN-list") {
    val byNation = cust.groupBy(_._3).view.mapValues(_.size).toSeq
    val top5 = byNation.sortBy { case (nk, n) => (-n, nk) }.take(5).map(_._1).toSet
    val exp = cust.filter(c => top5(c._3)).groupBy(_._2).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = Registry.byName("q_filter_7_dynamic_in").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exp.toSeq)
    assert(got.map(_._2).sum < cust.length, "the IN-list must filter someone")
  }

  test("q_udf_3_lev_parity: Scala DP UDF equals the builtin on every row") {
    val got = Registry.byName("q_udf_3_lev_parity").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, u, b, agree) =>
      assert(u == b); assert(agree == 1L)
    }
    // spot-check the DP itself against known distances
    import graft.operators.Round7pOps.levScala
    assert(levScala("kitten", "sitting") == 3)
    assert(levScala("", "abc") == 3)
    assert(levScala("abc", "abc") == 0)
    assert(levScala("flaw", "lawn") == 2)
  }
}
