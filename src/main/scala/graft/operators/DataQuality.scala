package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** Data-quality operators — the validation pass an ETL runs before
  * loading: per-column profiling, referential integrity, and
  * latest-record-wins key resolution (SCD-1 upsert shape).
  *
  * Scale notes: profiling is one aggregate pass (all stats in a single
  * HashAggregate — never one job per column). RI checks are anti-join
  * counts: broadcast the PK side when it is dimension-sized, shuffle
  * both sides by the key otherwise. Latest-per-key is max_by with a
  * total-ordered struct — one shuffle, no window sort.
  */
object DataQuality {

  val all: Seq[Q] = Seq(

    Q("q_dq_1_profile",
      """SELECT count(*) AS n_rows,
        | count(*) - count(o_custkey) AS null_custkey,
        | count(*) - count(o_orderdate) AS null_orderdate,
        | count(DISTINCT o_orderstatus) AS nd_status,
        | floor((min(o_totalprice)) * 100 + 0.5) / 100 AS min_price,
        | floor((max(o_totalprice)) * 100 + 0.5) / 100 AS max_price,
        | min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        | count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS nonpositive_price
        |FROM orders""".stripMargin) { (s, d) =>
      // Column profile in ONE aggregate pass.
      Tables(s, d, "orders").agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("o_custkey"))).as("null_custkey"),
        (count(lit(1)) - count(col("o_orderdate"))).as("null_orderdate"),
        countDistinct(col("o_orderstatus")).as("nd_status"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"),
        min("o_orderdate").as("min_date"),
        max("o_orderdate").as("max_date"),
        count(when(col("o_totalprice") <= 0, 1)).as("nonpositive_price"))
    },

    Q("q_dq_2_refint",
      """SELECT 'lineitem->orders' AS fk, count(*) AS n_orphans FROM lineitem
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orders->customer' AS fk, count(*) AS n_orphans FROM orders
        | WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |UNION ALL
        |SELECT 'customer->nation' AS fk, count(*) AS n_orphans FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
        |ORDER BY fk""".stripMargin) { (s, d) =>
      // Referential integrity: orphan counts per FK edge via anti joins.
      def orphans(fact: String, factKey: String, dim: String, dimKey: String, label: String) =
        Tables(s, d, fact).join(Tables(s, d, dim),
          col(factKey) === col(dimKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(label).as("fk"), col("n_orphans"))
      orphans("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem->orders")
        .unionByName(orphans("orders", "o_custkey", "customer", "c_custkey", "orders->customer"))
        .unionByName(orphans("customer", "c_nationkey", "nation", "n_nationkey", "customer->nation"))
        .orderBy("fk")
    },

    Q("q_dq_3_latest_wins",
      """SELECT user_id, event_id, date_trunc('second', ts::TIMESTAMP) AS ts_s, event_type FROM (
        | SELECT user_id, event_id, ts, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      // SCD-1 upsert resolution: latest record per key (ties broken by
      // event_id) — max_by over a total-ordered struct: one aggregate,
      // no per-partition window sort.
      Tables(s, d, "events")
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("event_id"),
          date_trunc("second", col("m.ts")).as("ts_s"),
          col("m.event_type").as("event_type"))
        .orderBy("user_id")
    },

    Q("q_dq_4_outliers",
      """WITH st AS (SELECT avg(o_totalprice) AS m, stddev_samp(o_totalprice) AS sd FROM orders),
        |z AS (SELECT o_orderkey, o_custkey,
        |       floor(((o_totalprice - st.m) / st.sd) * 1000000 + 0.5) / 1000000 AS z
        |      FROM orders, st)
        |SELECT o_orderkey, o_custkey, z FROM z
        |ORDER BY abs(z) DESC, o_orderkey LIMIT 15""".stripMargin) { (s, d) =>
      // Statistical outlier screen (z-score): one aggregate pass for the
      // global moments, broadcast back, top-15 by |z|. Ordering is on the
      // ROUNDED z so both engines rank identical values. At scale this is
      // a scan + TakeOrderedAndProject — no shuffle of the fact table;
      // per-group variants swap the broadcast for a groupBy moments pass.
      val o = Tables(s, d, "orders")
      val st = o.agg(avg("o_totalprice").as("m"), stddev_samp("o_totalprice").as("sd"))
      o.crossJoin(broadcast(st))
        .select(col("o_orderkey"), col("o_custkey"),
          round((col("o_totalprice") - col("m")) / col("sd"), 6).as("z"))
        .orderBy(abs(col("z")).desc, col("o_orderkey")).limit(15)
    },

    Q("q_dq_6_scd2",
      """WITH ev AS (SELECT user_id, event_id, event_type, ts FROM events WHERE user_id < 10),
        |ch AS (
        | SELECT user_id, event_id, event_type, ts,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
        | FROM ev),
        |flt AS (SELECT * FROM ch WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_id, event_type,
        | CAST(date_trunc('second', ts) AS TIMESTAMP) AS valid_from,
        | CAST(lead(date_trunc('second', ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS TIMESTAMP) AS valid_to,
        | lead(date_trunc('second', ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
        |FROM flt ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, d) =>
      // SCD-2 history build: collapse consecutive identical states per
      // key (lag-compare), then derive [valid_from, valid_to) intervals
      // with lead — the slowly-changing-dimension shape an ETL maintains.
      // Two window passes over the SAME (key, time) sort: Spark plans one
      // shuffle + one sort, both windows reuse it. Deterministic: window
      // order carries event_id as tie-break; boundaries second-truncated
      // identically on both engines.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = Tables(s, d, "events").filter(col("user_id") < 10)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changes
        .withColumn("valid_to", lead(date_trunc("second", col("ts")), 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_trunc("second", col("ts")).as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    },

    Q("q_dq_11_expectations",
      """WITH a AS (SELECT count(*) AS n,
        |  count(CASE WHEN o_custkey IS NULL THEN 1 END) AS f_cust,
        |  count(CASE WHEN NOT coalesce(o_orderdate BETWEEN TIMESTAMP '1992-01-01' AND TIMESTAMP '2001-12-31', FALSE) THEN 1 END) AS f_date,
        |  count(CASE WHEN NOT coalesce(o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), FALSE) THEN 1 END) AS f_prio,
        |  count(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 END) AS f_price
        | FROM orders)
        |SELECT rule, n_checked, n_failed, CAST(n_failed = 0 AS BIGINT) AS pass FROM (
        | SELECT 'custkey_not_null' AS rule, n AS n_checked, f_cust AS n_failed FROM a
        | UNION ALL SELECT 'date_in_range', n, f_date FROM a
        | UNION ALL SELECT 'priority_in_domain', n, f_prio FROM a
        | UNION ALL SELECT 'price_positive', n, f_price FROM a)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      // Declarative expectations suite (the Deequ shape) via the generic
      // graft.api.Pipelines.expectations: N rules = N conditional counts
      // in ONE HashAggregate over ONE scan (never a job per rule), then
      // stack() to one row per rule. NULL predicate results count as
      // failures so missing data can't silently pass a check.
      graft.api.Pipelines.expectations(Tables(s, d, "orders"), Seq(
        "custkey_not_null" -> col("o_custkey").isNotNull,
        "date_in_range" -> col("o_orderdate").between(
          lit("1992-01-01").cast("timestamp"), lit("2001-12-31").cast("timestamp")),
        "priority_in_domain" -> col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        "price_positive" -> (col("o_totalprice") > 0)))
        .orderBy("rule")
    }
  )
}
