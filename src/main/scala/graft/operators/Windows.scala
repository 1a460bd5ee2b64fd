package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** §2.5 — window functions.
  *
  * Scale notes: every window partitions by a real key (customer, part,
  * brand) → one hash shuffle on the partition key, then a per-partition
  * sort. None of these windows are global (an `orderBy` window without
  * `partitionBy` funnels all data through one task — forbidden at scale).
  * Window ORDER BYs always carry a unique tie-break key so rank/lag/lead
  * are deterministic (SURVEY §2.12).
  */
object Windows {

  val all: Seq[Q] = Seq(

    Q("q_win_1_ranking",
      """SELECT o_custkey, o_orderkey,
        | row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk,
        | ntile(4) OVER w AS quartile
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_win_2_running",
      """SELECT o_custkey, o_orderkey,
        | floor((sum(o_totalprice) OVER w) * 100 + 0.5) / 100 AS running_spend,
        | floor((avg(o_totalprice) OVER w) * 10000 + 0.5) / 10000 AS running_avg
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_spend"),
        round(avg("o_totalprice").over(w), 4).as("running_avg"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_win_3_sliding",
      """SELECT l_partkey, l_orderkey, l_linenumber,
        | floor((avg(l_quantity) OVER (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)) * 1000000 + 0.5) / 1000000 AS mov_avg_qty
        |FROM lineitem ORDER BY l_partkey, l_orderkey, l_linenumber, mov_avg_qty""".stripMargin) { (s, d) =>
      // Window ORDER BY carries l_extendedprice: (okey, line) is not
      // unique in the fixtures and a ROWS frame over an ambiguous order
      // is nondeterministic. Output adds mov_avg_qty for the same reason.
      val w = Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(-2, 2)
      Tables(s, d, "lineitem").select(
        col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        round(avg("l_quantity").over(w), 6).as("mov_avg_qty"))
        .orderBy("l_partkey", "l_orderkey", "l_linenumber", "mov_avg_qty")
    },

    Q("q_win_4_leadlag",
      """SELECT o_custkey, o_orderkey,
        | lag(o_orderkey) OVER w AS prev_key, lead(o_orderkey) OVER w AS next_key,
        | CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), o_orderdate::DATE) AS BIGINT) AS days_since_prev
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev_key"),
        lead("o_orderkey", 1).over(w).as("next_key"),
        datediff(col("o_orderdate").cast("date"), lag("o_orderdate", 1).over(w).cast("date"))
          .cast("long").as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_win_5_rangeframe",
      """SELECT p_brand, p_partkey,
        | floor((sum(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_retailprice
        |  RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING)) * 100 + 0.5) / 100 AS near_price_sum,
        | count(*) OVER (PARTITION BY p_brand ORDER BY p_retailprice
        |  RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING) AS near_price_cnt
        |FROM part ORDER BY p_brand, p_partkey""".stripMargin) { (s, d) =>
      // RANGE frame on a numeric ordering column: peers at equal price are
      // all included, so duplicate prices cannot break determinism.
      val w = Window.partitionBy("p_brand").orderBy("p_retailprice").rangeBetween(-10, 10)
      Tables(s, d, "part").select(
        col("p_brand"), col("p_partkey"),
        round(sum("p_retailprice").over(w), 2).as("near_price_sum"),
        count(lit(1)).over(w).as("near_price_cnt"))
        .orderBy("p_brand", "p_partkey")
    },

    Q("q_win_7_interval_range",
      """SELECT o_custkey, o_orderkey,
        | floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100 AS rolling_90d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      // Time-interval RANGE frame: rolling 90-day spend per customer.
      // Peers at equal o_orderdate are all included, so duplicate dates
      // cannot break determinism. (SQL-string form: interval range
      // boundaries are a SQL-only feature of the window syntax.)
      Tables(s, d, "orders").createOrReplaceTempView("orders_w7")
      s.sql("""
        SELECT o_custkey, o_orderkey,
          floor(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS rolling_90d
        FROM orders_w7 ORDER BY o_custkey, o_orderkey""")
    },

    Q("q_win_6_pctcume",
      """SELECT o_custkey, o_orderkey,
        | floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pr, floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cd,
        | first_value(o_orderkey) OVER w AS first_key,
        | last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        first("o_orderkey").over(w).as("first_key"),
        last("o_orderkey").over(wFull).as("last_key"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_win_8_nth",
      """SELECT o_custkey, o_orderkey,
        | floor((nth_value(o_totalprice, 2) OVER w) * 100 + 0.5) / 100 AS second_price,
        | floor((nth_value(o_totalprice, 3) OVER w) * 100 + 0.5) / 100 AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        | ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      // nth_value over the full-partition frame (explicit on BOTH sides —
      // engines' default frames differ, which silently nulls the tail
      // rows otherwise). NULL where the partition has < n rows.
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"),
        round(nth_value(col("o_totalprice"), 3).over(w), 2).as("third_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_win_9_gaps_islands",
      """WITH e AS (SELECT user_id, event_id, ts FROM events WHERE user_id < 50),
        |f AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000 THEN 1 ELSE 0 END AS brk
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        | SELECT user_id, ts,
        |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island_id
        | FROM f)
        |SELECT user_id, island_id, count(*) AS n_events,
        | min(ts) AS start_ts, max(ts) AS end_ts
        |FROM g GROUP BY user_id, island_id
        |ORDER BY user_id, island_id""".stripMargin) { (s, d) =>
      // Gaps-and-islands: consecutive events per user collapse into one
      // island while the gap stays ≤ 1 h; a strictly-greater gap starts
      // a new island (same strict-> convention as the session oracle —
      // an exact-gap event continues the island). The lag+running-sum
      // form is the declarative sessionizer: two window passes over the
      // SAME (user_id | ts, event_id) sort order, so Catalyst plans one
      // shuffle + one sort and both Window operators reuse it — the
      // shape that holds at 100 TB (no per-session state, no iteration).
      // Integer epoch-µs arithmetic keeps the gap test engine-exact.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("brk",
          when(lag(col("ts"), 1).over(w).isNull
            || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 3600000000L, 1L)
            .otherwise(0L))
        .withColumn("island_id", sum(col("brk")).over(wRun))
        .groupBy("user_id", "island_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
        .orderBy("user_id", "island_id")
    }
  )
}
