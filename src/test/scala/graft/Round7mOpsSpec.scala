package graft

/** Round-7m SQL-surface wave: brute-force replications on sf0.001. */
class Round7mOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }
  private def c2(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  private lazy val li = {
    import org.apache.spark.sql.functions.{col, date_format}
    graft.sources.Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("sd")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))
  }

  private lazy val ord = {
    import org.apache.spark.sql.functions.{col, date_format}
    graft.sources.Tables(spark, sf, "orders")
      .select(col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        col("o_totalprice"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
  }

  test("q_tpch_1_pricing: exact-cents Q1 replicates") {
    val kept = li.filter(_._7 <= "1998-09-02")
    val exp = kept.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1).map {
      case ((rf, ls), rows) =>
        val sq = rows.map(r => c2(r._3)).sum
        val sp = rows.map(r => c2(r._4)).sum
        val sd = rows.map(r => c2(r._4) * (100 - c2(r._5))).sum
        val sc = rows.map(r => c2(r._4) * (100 - c2(r._5)) * (100 + c2(r._6))).sum
        val sdisc = rows.map(r => c2(r._5)).sum
        val n = rows.length.toLong
        (rf, ls, rnd(sq.toDouble / 100, 2), rnd(sp.toDouble / 100, 2),
          rnd(sd.toDouble / 1e4, 2), rnd(sc.toDouble / 1e6, 2),
          rnd(sq.toDouble / 100 / n, 6), rnd(sp.toDouble / 100 / n, 6),
          rnd(sdisc.toDouble / 100 / n, 6), n)
    }
    val got = Registry.byName("q_tpch_1_pricing").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getLong(9)))
    assert(got.toSeq == exp)
    assert(got.map(_._10).sum == kept.length.toLong)
  }

  test("q_sort_6_nulls_order: nulls lead, ranks are 1..100, totals non-decreasing after nulls") {
    val got = Registry.byName("q_sort_6_nulls_order").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.map(_._1).toSeq == (1 to got.length))
    assert(got.length == math.min(100,
      graft.sources.Tables(spark, sf, "customer").count()).toInt)
    val (nulls, nonNulls) = got.span(_._3.isEmpty)
    assert(nonNulls.forall(_._3.nonEmpty), "all nulls must precede all non-nulls")
    val totals = nonNulls.flatMap(_._3)
    assert(totals.zip(totals.drop(1)).forall { case (a, b) => a <= b })
    // brute-force cross-check of the null set: customers with no orders
    val withOrders = ord.map(_._1).toSet
    val nullCust = nulls.map(_._2).toSet
    assert(nullCust.forall(ck => !withOrders.contains(ck)))
  }

  test("q_arr_5_set_algebra: month-set sizes replicate") {
    val om = ord.filter(o => o._2.take(4) == "1995" || o._2.take(4) == "1996")
      .map(o => (o._1, o._2.take(4).toInt, o._2.substring(5, 7).toInt)).distinct
    val exp = om.groupBy(_._1).toSeq.sortBy(_._1).map { case (ck, rows) =>
      val m95 = rows.filter(_._2 == 1995).map(_._3).toSet
      val m96 = rows.filter(_._2 == 1996).map(_._3).toSet
      (ck, m95.size.toLong, m96.size.toLong, (m95 & m96).size.toLong,
        (m95 -- m96).size.toLong,
        rnd((m95 & m96).size.toDouble / (m95 | m96).size, 6))
    }
    val got = Registry.byName("q_arr_5_set_algebra").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == exp)
  }

  test("q_map_5_zipmerge: merged map equals conditional aggregation") {
    val cust = graft.sources.Tables(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nat = graft.sources.Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val rows = ord.filter(o => o._2.take(4) == "1995" || o._2.take(4) == "1996")
      .map(o => (nat(cust(o._1)), o._4, o._2.take(4).toInt))
    val exp = rows.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1).map {
      case ((nn, pr), rs) =>
        val n95 = rs.count(_._3 == 1995).toLong
        val n96 = rs.count(_._3 == 1996).toLong
        (nn, pr, n95, n96, n95 + n96)
    }
    val got = Registry.byName("q_map_5_zipmerge").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == exp)
  }

  test("q_udtf_3_stack: 3 metric rows per region, values match direct counts") {
    val got = Registry.byName("q_udtf_3_stack").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val regions = got.map(_._1).distinct
    assert(got.length == regions.length * 3)
    regions.foreach { rg =>
      assert(got.filter(_._1 == rg).map(_._2).sorted.toSeq ==
        Seq("customers", "nations", "suppliers"))
    }
    val natTotal = got.filter(_._2 == "nations").map(_._3).sum
    assert(natTotal == graft.sources.Tables(spark, sf, "nation").count())
  }

  test("q_sub_7_not_exists: semi∧anti equals EXISTS∧NOT-EXISTS brute force") {
    val byCust = ord.groupBy(_._1)
    val cust = graft.sources.Tables(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = cust.filter { case (ck, _) =>
      byCust.contains(ck) && !byCust(ck).exists(_._3 > 300000)
    }.groupBy(_._2).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val got = Registry.byName("q_sub_7_not_exists").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exp)
  }

  test("q_filter_5_like_matrix: predicate counts replicate on raw strings") {
    val names = graft.sources.Tables(spark, sf, "part")
      .select("p_name").collect().map(_.getString(0))
    val got = Registry.byName("q_filter_5_like_matrix").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == names.length.toLong)
    assert(got.getLong(1) == names.count(_.contains("red")).toLong)
    assert(got.getLong(2) == names.count(_.startsWith("small")).toLong)
    assert(got.getLong(3) == names.count(_.endsWith("bolt")).toLong)
    assert(got.getLong(4) == names.count(n =>
      "^.*e.*o.*$".r.findFirstIn(n).nonEmpty).toLong)
    assert(got.getLong(5) == names.count(n =>
      n.startsWith("red ") || n.startsWith("blue ")).toLong)
    assert(got.getLong(6) == names.count(!_.contains("a")).toLong)
    assert(got.getLong(1) > 0 && got.getLong(2) > 0 && got.getLong(3) > 0)
  }

  test("q_proj_10_string_battery: scalar functions replicate on supplier names") {
    val got = Registry.byName("q_proj_10_string_battery").fn(spark, sf).collect()
    val nSupp = graft.sources.Tables(spark, sf, "supplier").count()
    assert(got.length == math.min(30L, nSupp).toInt)
    got.foreach { r =>
      val k = r.getLong(0)
      val name = f"Supplier#$k%09d"
      assert(r.getString(1) == name.toUpperCase)
      assert(r.getString(2) == name.reverse)
      assert(r.getString(3) == ("0" * (9 - k.toString.length)) + k.toString)
      assert(r.getString(4) == name.replace('#', '-').replace('0', 'x'))
      assert(r.getString(5) == f"$k%09d")
      assert(r.getString(6) == "SSS")
      assert(r.getLong(7) == 'S'.toLong)
      assert(r.getLong(8) == name.length.toLong)
    }
  }
}
