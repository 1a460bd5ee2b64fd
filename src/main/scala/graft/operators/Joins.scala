package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** §2.3 — joins.
  *
  * Scale notes:
  *  - Dimension joins (`nation`, `region`, `part`, `customer`) are
  *    explicitly `broadcast()` — at 100 TB the fact side never shuffles
  *    for these. Fact-fact joins (lineitem⋈orders) shuffle on the join
  *    key; at production scale both sides would be bucketed by orderkey
  *    to make this a zero-shuffle sort-merge join.
  *  - The theta/range join is implemented as an equi-join on a coarse
  *    date-band plus an exact residual filter: this is the 100 TB-safe
  *    pattern (hash-partitionable) — a raw BroadcastNestedLoopJoin over
  *    two facts would be O(n·m) and cannot scale.
  *  - The as-of join is a single shuffle on the partition key + one
  *    ordered window pass — the standard streaming-friendly formulation
  *    (no point-in-time cross product is ever materialized).
  */
object Joins {

  val all: Seq[Q] = Seq(

    Q("q_join_1_inner_hash",
      """SELECT l_orderkey, l_linenumber, o_custkey, o_orderpriority,
        | floor((l_extendedprice) * 100 + 0.5) / 100 AS price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber, price""".stripMargin) { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          col("o_orderpriority"), round(col("l_extendedprice"), 2).as("price"))
        .orderBy("l_orderkey", "l_linenumber", "price")
    },

    Q("q_join_2_broadcast",
      """SELECT p_brand, count(*) AS n_items, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      val li = Tables(s, d, "lineitem")
      val p = Tables(s, d, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("p_brand")
    },

    Q("q_join_3_multiway",
      """SELECT r_name, n_name, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue, count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      // 5-way star (TPC-H Q5 shape). Join order: fact⋈fact first (orders
      // carries the custkey), then ever-smaller broadcast dims.
      val li = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      val r = Tables(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    Q("q_join_4_left_outer",
      """SELECT c_custkey, count(o_orderkey) AS n_orders, floor((coalesce(sum(o_totalprice), 0)) * 100 + 0.5) / 100 AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0)), 2).as("spend"))
        .orderBy("c_custkey")
    },

    Q("q_join_5_full_outer",
      """SELECT coalesce(sn, cn) AS nationkey, coalesce(n_rich_supp, 0) AS n_rich_supp, coalesce(n_rich_cust, 0) AS n_rich_cust
        |FROM (SELECT s_nationkey AS sn, count(*) AS n_rich_supp FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) a
        |FULL OUTER JOIN (SELECT c_nationkey AS cn, count(*) AS n_rich_cust FROM customer WHERE c_acctbal > 9500 GROUP BY c_nationkey) b
        |ON sn = cn ORDER BY nationkey""".stripMargin) { (s, d) =>
      // Thresholds chosen so each side covers only SOME nations → genuine
      // unmatched rows on both sides of the full outer join.
      val a = Tables(s, d, "supplier").filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("sn")).agg(count(lit(1)).as("n_rich_supp"))
      val b = Tables(s, d, "customer").filter(col("c_acctbal") > 9500)
        .groupBy(col("c_nationkey").as("cn")).agg(count(lit(1)).as("n_rich_cust"))
      a.join(b, col("sn") === col("cn"), "full_outer")
        .select(coalesce(col("sn"), col("cn")).as("nationkey"),
          coalesce(col("n_rich_supp"), lit(0)).as("n_rich_supp"),
          coalesce(col("n_rich_cust"), lit(0)).as("n_rich_cust"))
        .orderBy("nationkey")
    },

    Q("q_join_6_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q_join_7_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    Q("q_join_8_theta_range",
      """SELECT o_orderpriority, count(*) AS n_pairs,
        | CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_price
        |FROM lineitem, orders
        |WHERE l_shipdate >= TIMESTAMP '1996-06-01' AND l_shipdate < TIMESTAMP '1996-06-08'
        | AND o_orderdate >= TIMESTAMP '1996-03-01' AND o_orderdate <= TIMESTAMP '1996-06-08'
        | AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // Band-join pattern: explode the order's validity interval into month
      // buckets, equi-join on the bucket, then apply the exact BETWEEN as a
      // residual filter. Each (li, order) pair meets on exactly one bucket
      // (the lineitem's ship month) so no dedup is needed. Hash-partitionable
      // → survives 100 TB; a nested-loop theta join would not.
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-06-08").cast("timestamp"))
        .withColumn("band", date_trunc("month", col("l_shipdate")))
      // valid_until is computed ONCE per order row, pre-join: interval
      // arithmetic inside the join's residual condition would run per
      // PAIR (~10M×) through interpreted DateTimeUtils — observed 40×
      // slowdown. Post-fix the residual is two long comparisons.
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-03-01").cast("timestamp")
          && col("o_orderdate") <= lit("1996-06-08").cast("timestamp"))
        .withColumn("valid_until", col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .withColumn("band", explode(sequence(
          date_trunc("month", col("o_orderdate")),
          date_trunc("month", col("valid_until")),
          expr("INTERVAL 1 MONTH"))))
      // sum over ~10M pairs reaches 1e11 — double accumulation error
      // exceeds 2dp there, so sum exact integer CENTS (≪ 2^53) and
      // divide once: bit-deterministic at any scale factor
      li.join(o, Seq("band"))
        .filter(col("l_shipdate").between(col("o_orderdate"), col("valid_until")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_pairs"),
          (sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).cast("double") / 100)
            .as("sum_price"))
        .orderBy("o_orderpriority")
    },

    Q("q_join_12_range_auto",
      """SELECT o_orderpriority, count(*) AS n_pairs, count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem, orders
        |WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-06-08'
        | AND o_orderdate >= TIMESTAMP '1997-03-01' AND o_orderdate <= TIMESTAMP '1997-06-08'
        | AND l_shipdate >= o_orderdate AND l_shipdate <= o_valid
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
        .replace("o_valid", "o_orderdate + INTERVAL 90 DAY")) { (s, d) =>
      // The same range-join semantics as q_join_8, but written NAIVELY
      // (plain BETWEEN condition, no manual banding) and optimized by
      // graft.plans.RangeBandJoinRule — Spark alone would plan a
      // BroadcastNestedLoopJoin; the rule turns it into the band hash
      // join automatically.
      graft.plans.RangeBandJoinRule.install(s)
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-06-08").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-03-01").cast("timestamp")
          && col("o_orderdate") <= lit("1997-06-08").cast("timestamp"))
        .withColumn("o_valid", col("o_orderdate") + expr("INTERVAL 90 DAY"))
      li.join(o, col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") <= col("o_valid"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("o_orderpriority")
    },

    Q("q_join_13_numeric_range",
      """SELECT a.p_partkey AS pk, count(*) AS n_similar,
        | floor((CAST(sum(CAST(floor(b.p_retailprice * 10 + 0.5) AS BIGINT)) AS DOUBLE) / (count(*) * CAST(10 AS DOUBLE))) * 100 + 0.5) / 100 AS avg_price
        |FROM part a JOIN part b
        | ON b.p_retailprice >= a.p_retailprice - 5.0 AND b.p_retailprice <= a.p_retailprice + 5.0
        |GROUP BY a.p_partkey ORDER BY pk""".stripMargin) { (s, d) =>
      // NUMERIC pure range join, value column on the RIGHT — exercises
      // both RangeBandJoinRule generalizations (non-timestamp banding +
      // mirrored sides). Written naively; the rule turns the nested loop
      // into a band hash join (width 10 ≈ the ±5 window → ≤2 bands/row).
      // avg goes through floor(p*10+.5) longs so the sum is exact-integer
      // on both engines (double sum order would flirt with .xx5 edges).
      graft.plans.RangeBandJoinRule.install(s)
      val p = Tables(s, d, "part")
      val a = p.select(col("p_partkey").as("pk"),
        (col("p_retailprice") - 5.0).as("lo"), (col("p_retailprice") + 5.0).as("hi"))
      val b = p.select(col("p_retailprice").as("bp"))
      a.join(b, col("bp") >= col("lo") && col("bp") <= col("hi"))
        .groupBy("pk")
        .agg(count(lit(1)).as("n_similar"),
          round(sum(floor(col("bp") * 10 + 0.5).cast("long")).cast("double")
            / (count(lit(1)) * lit(10.0)), 2).as("avg_price"))
        .orderBy("pk")
    },

    Q("q_join_9_asof",
      """SELECT event_id, user_id, ts_s, last_click_ts FROM (
        | SELECT event_id, user_id, event_type, date_trunc('second', ts::TIMESTAMP) AS ts_s,
        |  max(CASE WHEN event_type = 'click' THEN date_trunc('second', ts::TIMESTAMP) END)
        |   OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_type ROWS UNBOUNDED PRECEDING) AS last_click_ts
        | FROM events WHERE event_type IN ('click', 'purchase'))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, d) =>
      // As-of join: for each purchase, the latest click of the same user at
      // or before it. One shuffle on user_id + one ordered window pass —
      // the point-in-time pattern that scales (no cross product).
      // 'click' < 'purchase' lexicographically → equal-ts clicks sort first
      // and are visible to the purchase (ties resolved identically in both
      // engines).
      val ev = Tables(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_click_ts",
          max(when(col("event_type") === "click", date_trunc("second", col("ts")))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts_s"), col("last_click_ts"))
        .orderBy("event_id")
    },

    Q("q_join_16_asof_tol",
      """SELECT event_id, user_id, ts_s,
        | CASE WHEN next_view_ts IS NOT NULL
        |       AND epoch_us(next_view_ts) - epoch_us(ts_f) <= 1800000000
        |      THEN date_trunc('second', next_view_ts) END AS followup_view_ts
        |FROM (
        | SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts_f,
        |  date_trunc('second', ts::TIMESTAMP) AS ts_s,
        |  min(CASE WHEN event_type = 'view' THEN ts::TIMESTAMP END)
        |   OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_type
        |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_view_ts
        | FROM events WHERE event_type IN ('purchase', 'view'))
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, d) =>
      // FORWARD as-of join with a tolerance (pandas merge_asof
      // direction='forward', tolerance=30min): for each purchase, the
      // first view by the same user at-or-after it, nulled when it
      // falls outside the 30-minute window. Same scale shape as the
      // backward as-of (q_join_9): one shuffle on user_id + one ordered
      // window pass, no cross product; the tolerance is a post-window
      // integer epoch-µs filter, engine-exact. 'purchase' < 'view'
      // lexicographically, so equal-ts views sort after the purchase
      // and stay visible to its following frame in both engines.
      val ev = Tables(s, d, "events")
        .filter(col("event_type").isin("purchase", "view"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_type"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("next_view_ts",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts_s"),
          when(col("next_view_ts").isNotNull
            && unix_micros(col("next_view_ts")) - unix_micros(col("ts")) <= 1800000000L,
            date_trunc("second", col("next_view_ts"))).as("followup_view_ts"))
        .orderBy("event_id")
    },

    Q("q_join_10_self",
      """SELECT o_custkey, o_orderkey, next_orderkey, CAST(gap_days AS BIGINT) AS gap_days FROM (
        | SELECT o_custkey, o_orderkey,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey,
        |  date_diff('day', o_orderdate::DATE,
        |   lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)::DATE) AS gap_days
        | FROM orders)
        |WHERE next_orderkey IS NOT NULL ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      // Self-join expressed as lead() over one window — a real self-join
      // would shuffle orders twice; this shuffles once.
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lead("o_orderkey", 1).over(w).as("next_orderkey"),
          datediff(lead("o_orderdate", 1).over(w).cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("gap_days"))
        .filter(col("next_orderkey").isNotNull)
        .orderBy("o_custkey", "o_orderkey")
    }
  )
}
