package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** Classic TPC-H query shapes adapted to the fixture schemas — the
  * canonical decision-support suite an analytics engine is expected to
  * run (Q1 ≈ q_agg_2_group and Q5 ≈ q_join_3_multiway live in their
  * operator families; this file adds the Q3/Q10/Q12/Q14/Q18 shapes).
  *
  * Scale notes: all follow the star-join discipline — dimension sides
  * (customer, part, nation) broadcast or shuffle once on the join key;
  * the lineitem fact shuffles at most once; every date/segment filter
  * sits on a raw column so it reaches the Parquet scan (PushedFilters);
  * top-k endings are TakeOrderedAndProject on the rounded measure.
  */
object TpchShapes {

  val all: Seq[Q] = Seq(

    // Q3: shipping-priority revenue of not-yet-shipped orders in a segment
    Q("q_tpch_3_shipping",
      """SELECT l_orderkey, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue, o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // Q4: orders with ≥1 late-shipped lineitem, counted by priority
    Q("q_tpch_4_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |             WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // EXISTS → left_semi join (never a count-then-filter on the fact);
      // the +30d endpoint precomputed on the orders side pre-join
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .withColumn("o_cut", col("o_orderdate") + expr("INTERVAL 30 DAY"))
      val l = Tables(s, d, "lineitem")
      o.join(l, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_cut"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q6: the canonical scan-aggregate (forecast revenue change)
    Q("q_tpch_6_forecast",
      """SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
      // pure pushed-down-filter scan + single agg: every predicate is on
      // a raw column (PushedFilters reaches the parquet row groups),
      // ReadSchema prunes to 4 columns
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

    // Q10: revenue lost to returned items per customer, one quarter
    Q("q_tpch_10_returns",
      """SELECT c_custkey, c_name, n_name,
        | floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue,
        | floor((c_acctbal) * 100 + 0.5) / 100 AS acctbal
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        | AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = Tables(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val n = Tables(s, d, "nation")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"),
          round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // Q12 shape: late-shipment counts by order priority class
    Q("q_tpch_12_late",
      """SELECT o_orderpriority, count(*) AS n_late,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM orders, lineitem
        |WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // equi hash join on orderkey; the +60d endpoint is precomputed in
      // the projection so only column comparisons reach the filter
      val o = Tables(s, d, "orders")
        .withColumn("o_cutoff", col("o_orderdate") + expr("INTERVAL 60 DAY"))
      val l = Tables(s, d, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_cutoff"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("n_high"))
        .orderBy("o_orderpriority")
    },

    // Q14: promo revenue share in one month
    Q("q_tpch_14_promo",
      """SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount))) * 10000 + 0.5) / 10000 AS promo_pct
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        | AND l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin) { (s, d) =>
      val l = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      val p = Tables(s, d, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) / sum(rev), 4)
          .as("promo_pct"))
    },

    // Q18: large-volume orders (HAVING on the grouped fact)
    Q("q_tpch_18_bigorders",
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        | floor((o_totalprice) * 100 + 0.5) / 100 AS totalprice,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |HAVING sum(l_quantity) > 120
        |ORDER BY totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, d) =>
      // l_quantity is integral in the fixtures, so the HAVING threshold
      // compares exact values — no float-boundary risk.
      // Aggregate lineitem by orderkey FIRST (narrow (key, qty) shuffle
      // with map-side partial agg), apply the HAVING, and only then join
      // the few surviving orders to the dimensions — at scale the
      // survivors broadcast, so the fact table is shuffled once on a
      // 2-column projection instead of a 5-column row. o_orderkey
      // determines the other group columns, so this plan is equivalent
      // to the textbook group-by-all formulation the oracle uses.
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      val big = Tables(s, d, "lineitem")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("sum_qty_d"))
        .filter(col("sum_qty_d") > 120)
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice"), 2).as("totalprice"),
          col("sum_qty_d").cast("long").as("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey")).limit(25)
    }
  )
}
