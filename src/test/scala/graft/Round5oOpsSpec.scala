package graft

import org.apache.spark.sql.functions._

/** Round-5o operators (the remaining TPC-H shapes): brute-force Scala
  * replications over collected sf0.001 fixtures, plus the plan-shape
  * contracts the adaptations promise (broadcast dims, pruned scans).
  */
class Round5oOpsSpec extends SparkSpec {

  private def q2(x: Double): Double = math.floor(x * 100 + 0.5) / 100

  private lazy val lineitem =
    graft.sources.Tables(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "CAST(year(l_shipdate) AS BIGINT) AS ship_year")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))

  private lazy val orders =
    graft.sources.Tables(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  private lazy val parts =
    graft.sources.Tables(spark, sf, "part")
      .selectExpr("p_partkey", "p_brand", "p_size", "p_retailprice")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))

  test("q_tpch_13_custdist: k=0 customers appear; histogram replicates exactly") {
    val nonLow = orders.filter(_._3 != "5-LOW").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nCust = graft.sources.Tables(spark, sf, "customer").count()
    val perCust = graft.sources.Tables(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(ck => nonLow.getOrElse(ck, 0L))
    val expected = perCust.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Registry.byName("q_tpch_13_custdist").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    // every customer is represented exactly once across the histogram
    assert(got.values.sum == nCust)
    // the zero-order bucket exists iff some customer has no non-LOW order
    assert(got.contains(0L) == perCust.contains(0L))
  }

  test("q_tpch_19_or: disjunctive-bundle revenue replicates") {
    val pm = parts.map(p => p._1 -> p).toMap
    val rev = lineitem.flatMap { l =>
      pm.get(l._2).collect {
        case p if (p._2 == "Brand#1" && p._3 >= 1 && p._3 <= 15 && l._4 >= 1 && l._4 <= 11) ||
          (p._2 == "Brand#2" && p._3 >= 1 && p._3 <= 25 && l._4 >= 10 && l._4 <= 20) ||
          (p._2 == "Brand#3" && p._3 >= 1 && p._3 <= 35 && l._4 >= 20 && l._4 <= 30) =>
          l._5 * (1 - l._6)
      }
    }.sum
    val got = Registry.byName("q_tpch_19_or").fn(spark, sf).collect().head.getDouble(0)
    assert(got == q2(rev))
  }

  test("q_tpch_17_smallqty: per-part mean cut replicates; threshold uses sum/count division") {
    val byPart = lineitem.groupBy(_._2)
    val cut = byPart.view.mapValues { ls =>
      0.2 * (ls.map(_._4).sum / ls.size.toDouble)
    }.toMap
    val brand1 = parts.filter(_._2 == "Brand#1").map(_._1).toSet
    val total = lineitem.filter(l => brand1(l._2) && l._4 < cut(l._2)).map(_._5).sum
    val got = Registry.byName("q_tpch_17_smallqty").fn(spark, sf).collect().head
    if (got.isNullAt(0)) assert(total == 0.0)
    else assert(got.getDouble(0) == q2(total / 7.0))
  }

  test("q_tpch_9_profit: nation/year profit replicates under the retailprice cost basis") {
    val widget = graft.sources.Tables(spark, sf, "part")
      .filter(col("p_name").like("%widget%"))
      .select("p_partkey", "p_retailprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val supNation = graft.sources.Tables(spark, sf, "supplier")
      .join(graft.sources.Tables(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = lineitem.flatMap { l =>
      widget.get(l._2).map { rp =>
        ((supNation(l._3), l._7), l._5 * (1 - l._6) - 0.6 * rp * l._4)
      }
    }.groupBy(_._1).view.mapValues(v => q2(v.map(_._2).sum)).toMap
    val got = Registry.byName("q_tpch_9_profit").fn(spark, sf)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == expected)
  }

  test("q_tpch_5/7/8 plan contracts: fact shuffles once, dims broadcast") {
    for (name <- Seq("q_tpch_5_local", "q_tpch_7_volume", "q_tpch_8_share")) {
      val df = Registry.byName(name).fn(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name should broadcast dimensions:\n" + plan)
      assert(df.columns.nonEmpty)
    }
    // Q8 share is a probability: every year in [0, 1]
    val shares = Registry.byName("q_tpch_8_share").fn(spark, sf)
      .collect().map(_.getDouble(1))
    assert(shares.forall(s => s >= 0.0 && s <= 1.0))
  }
}
