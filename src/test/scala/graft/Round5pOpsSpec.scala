package graft

import org.apache.spark.sql.functions._

/** Round-5p operators (TPC-H completion part 2): brute-force Scala
  * replications of the decorrelated subquery shapes over collected
  * sf0.001 fixtures, plus the exact-integer-threshold invariants.
  */
class Round5pOpsSpec extends SparkSpec {

  private lazy val lineitem =
    graft.sources.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))

  test("q_tpch_2_mincost: winner per part has the minimal exact cost6; ties break by suppkey") {
    val rows = Registry.byName("q_tpch_2_mincost").fn(spark, sf).collect()
    val euro = graft.sources.Tables(spark, sf, "supplier")
      .join(graft.sources.Tables(spark, sf, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables(spark, sf, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val cost6 = lineitem.filter(l => euro(l._3)).groupBy(l => (l._2, l._3)).map { case ((pk, sk), ls) =>
      val cents = ls.map(l => math.floor(l._5 * 100 + 0.5).toLong).sum
      val qty = ls.map(_._4.toLong).sum
      (pk, sk) -> math.floor(cents.toDouble / qty * 1000000 + 0.5).toLong
    }
    val best = cost6.groupBy(_._1._1).view.mapValues { m =>
      m.toSeq.map { case ((_, sk), c6) => (c6, sk) }.min
    }.toMap
    rows.foreach { r =>
      val (pk, sk, uc) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val (c6, bsk) = best(pk)
      assert(sk == bsk && uc == c6 / 1000000.0, s"part $pk")
    }
  }

  test("q_tpch_11_stock: threshold is the exact 1000*val > total integer form") {
    val got = Registry.byName("q_tpch_11_stock").fn(spark, sf).collect()
    val n3 = graft.sources.Tables(spark, sf, "supplier")
      .join(graft.sources.Tables(spark, sf, "nation").filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val rc = graft.sources.Tables(spark, sf, "part")
      .select("p_partkey", "p_retailprice").collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100 + 0.5).toLong).toMap
    val vals = lineitem.filter(l => n3(l._3)).groupBy(_._2).view
      .mapValues(ls => ls.map(l => l._4.toLong * rc(l._2)).sum).toMap
    val total = vals.values.sum
    val expected = vals.filter { case (_, v) => 1000 * v > total }
    assert(got.map(_.getLong(0)).toSet == expected.keySet)
    got.foreach { r =>
      assert(r.getDouble(1) == math.floor(expected(r.getLong(0)).toDouble / 100 * 100 + 0.5) / 100)
    }
  }

  test("q_tpch_15_topsupp: every returned supplier holds the exact max cents revenue") {
    val df = Registry.byName("q_tpch_15_topsupp").fn(spark, sf).collect()
    assert(df.nonEmpty)
    // all returned totals are identical (they all equal the max)
    assert(df.map(_.getDouble(2)).distinct.length == 1)
  }

  test("q_tpch_20_excess: dominance is strict majority of the part's 1997 volume") {
    val got = Registry.byName("q_tpch_20_excess").fn(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val shipYear = graft.sources.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber", "CAST(year(l_shipdate) AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val li97 = graft.sources.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
      .collect()
      .filter(r => shipYear((r.getLong(0), r.getInt(1))) == 1997L)
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4).toLong))
    val bySupp = li97.groupBy(l => (l._1, l._2)).view.mapValues(_.map(_._3).sum).toMap
    val byPart = li97.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n2 = graft.sources.Tables(spark, sf, "supplier")
      .join(graft.sources.Tables(spark, sf, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(graft.sources.Tables(spark, sf, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val expected = bySupp.collect {
      case ((pk, sk), sq) if n2(sk) && 2 * sq > byPart(pk) => sk
    }.toSet
    assert(got == expected)
  }

  test("q_tpch_21_waiting: only-late supplier in multi-supplier F orders") {
    val orders = graft.sources.Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .selectExpr("o_orderkey", "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val f = li.filter(l => orders.contains(l._1))
      .groupBy(l => (l._1, l._2)).view
      .mapValues(ls => ls.exists(l => l._3 > orders(l._1) + 45L * 86400000000L)).toMap
    val per = f.keys.groupBy(_._1).view.mapValues { ks =>
      (ks.size, ks.count(k => f(k)))
    }.toMap
    val waits = f.collect {
      case ((ok, sk), true) if per(ok)._1 >= 2 && per(ok)._2 == 1 => sk
    }
    val names = graft.sources.Tables(spark, sf, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = waits.groupBy(sk => names(sk)).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (n, c) => (-c, n) }.take(10).toMap
    val got = Registry.byName("q_tpch_21_waiting").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q_tpch_22_global: integer cross-multiplied mean test; no customer has orders") {
    val custs = graft.sources.Tables(spark, sf, "customer")
      .filter(col("c_nationkey").isin(1, 2, 3, 4, 5))
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val pos = custs.filter(_._3 > 0)
    val (sc, n) = (pos.map(_._3).sum, pos.length.toLong)
    val withOrders = graft.sources.Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val rich = custs.filter(c => c._3 * n > sc && !withOrders(c._1))
    val expected = rich.groupBy(_._2).view.mapValues { cs =>
      (cs.size.toLong, math.floor(cs.map(_._3).sum.toDouble / 100 * 100 + 0.5) / 100)
    }.toMap
    val got = Registry.byName("q_tpch_22_global").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }
}
