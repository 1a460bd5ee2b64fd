package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** Subquery shapes + the SQL-string entry point (SURVEY §3.4) + time-spine
  * generation.
  *
  * Scale notes: Catalyst decorrelates the correlated scalar subquery into
  * an aggregate + join (no per-row re-execution) — verified in the plan
  * audit. The SQL-string queries register temp views and go through the
  * same analyzer/optimizer as the DataFrame forms. The date spine is
  * driver-side-free generation (sequence + explode), the standard way to
  * densify sparse time series without a calendar table.
  */
object Subqueries {

  val all: Seq[Q] = Seq(

    Q("q_sub_1_correlated_scalar",
      """SELECT o_orderkey, floor((o_totalprice) * 100 + 0.5) / 100 AS price
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT floor(avg(o_totalprice) * 100 + 0.5) / 100 FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Correlated scalar subquery, written in SQL so Catalyst's
      // decorrelation (RewriteCorrelatedScalarSubquery) handles it.
      Tables(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS price
        FROM orders_v o
        WHERE o_totalprice > 2 * (SELECT floor(avg(o_totalprice) * 100 + 0.5) / 100 FROM orders_v i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },

    Q("q_sub_2_in_subquery",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // IN-subquery via the SQL entry — planned as a left-semi join.
      Tables(s, d, "part").createOrReplaceTempView("part_v")
      Tables(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT p_partkey, p_name FROM part_v
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem_v WHERE l_quantity >= 49)
        ORDER BY p_partkey""")
    },

    Q("q_time_1_spine",
      """WITH months AS (
        | SELECT unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-08-01', INTERVAL 1 MONTH)) AS mon),
        |counts AS (
        | SELECT date_trunc('month', o_orderdate) AS mon, count(*) AS n, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total
        | FROM orders GROUP BY 1)
        |SELECT months.mon, coalesce(counts.n, 0) AS n, coalesce(counts.total, 0.0) AS total
        |FROM months LEFT JOIN counts ON months.mon = counts.mon
        |ORDER BY months.mon""".stripMargin) { (s, d) =>
      // Dense month spine over the order-date domain, left-joined to the
      // actual per-month totals (missing months appear with 0).
      val spine = s.range(1)
        .select(explode(sequence(
          lit("1995-01-01").cast("timestamp"),
          lit("2001-08-01").cast("timestamp"),
          expr("INTERVAL 1 MONTH"))).as("mon"))
      val counts = Tables(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      spine.join(counts, Seq("mon"), "left")
        .select(col("mon"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0)).as("total"))
        .orderBy("mon")
    },

    Q("q_time_2_ffill",
      """WITH ev AS (
        | SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  floor((max(value)) * 10000 + 0.5) / 10000 AS v
        | FROM events WHERE user_id < 5 GROUP BY 1, 2),
        |days AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31', INTERVAL 1 DAY)) AS day),
        |users AS (SELECT DISTINCT user_id FROM ev),
        |grid AS (SELECT user_id, day FROM users, days)
        |SELECT g.user_id, g.day,
        | last_value(ev.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM grid g LEFT JOIN ev ON g.user_id = ev.user_id AND g.day = ev.day
        |ORDER BY g.user_id, g.day""".stripMargin) { (s, d) =>
      // Forward fill (LOCF) over a dense daily spine — the gap-filling
      // step of time-series feature pipelines. Missing days inherit the
      // last observed value; days before a user's first observation stay
      // NULL. One window sort per user partition; the spine cross join is
      // users×days (tiny) and the fact side joins by (user, day) key.
      val ev = Tables(s, d, "events").filter(col("user_id") < 5)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(max("value"), 4).as("v"))
      val days = s.range(1).select(explode(sequence(
        lit("2024-01-01").cast("timestamp"),
        lit("2024-01-31").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("day"))
      val users = ev.select("user_id").distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      users.crossJoin(days)
        .join(ev, Seq("user_id", "day"), "left")
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("day"), col("v_filled"))
        .orderBy("user_id", "day")
    },

    Q("q_time_5_interp",
      """WITH ev AS (
        | SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  floor((max(value)) * 10000 + 0.5) / 10000 AS v
        | FROM events WHERE user_id < 5 GROUP BY 1, 2),
        |days AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31', INTERVAL 1 DAY)) AS day),
        |users AS (SELECT DISTINCT user_id FROM ev),
        |grid AS (
        | SELECT u.user_id, d.day, ev.v FROM users u CROSS JOIN days d
        | LEFT JOIN ev ON u.user_id = ev.user_id AND d.day = ev.day),
        |anch AS (
        | SELECT user_id, day, v,
        |  last_value(v IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS pd,
        |  first_value(v IGNORE NULLS) OVER wf AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nd
        | FROM grid
        | WINDOW wp AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |        wf AS (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        | floor((CASE WHEN v IS NOT NULL THEN v
        |   WHEN pv IS NULL OR nv IS NULL THEN NULL
        |   ELSE pv + (nv - pv) * (CAST(epoch_us(day) - epoch_us(pd) AS DOUBLE)
        |                          / CAST(epoch_us(nd) - epoch_us(pd) AS DOUBLE)) END) * 10000 + 0.5) / 10000 AS v_interp
        |FROM anch ORDER BY user_id, day""".stripMargin) { (s, d) =>
      // Linear interpolation between observations — the step past LOCF
      // (q_time_2) for numeric series: missing days get the straight
      // line between the surrounding anchors; the head (no previous
      // anchor) and tail (no next) stay NULL, observed days pass
      // through. Four anchor columns from two frames over ONE
      // (user | day) sort → one shuffle + one sort, both Window
      // operators reuse it. The time ratio is integer epoch-µs
      // arithmetic before the single double division, so both engines
      // compute bit-identical interpolants.
      val ev = Tables(s, d, "events").filter(col("user_id") < 5)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(max("value"), 4).as("v"))
      val days = s.range(1).select(explode(sequence(
        lit("2024-01-01").cast("timestamp"),
        lit("2024-01-31").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("day"))
      val users = ev.select("user_id").distinct()
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      users.crossJoin(days)
        .join(ev, Seq("user_id", "day"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("pd", last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
        .withColumn("nd", first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wf))
        .select(col("user_id"), col("day"),
          round(when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull || col("nv").isNull, lit(null))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((unix_micros(col("day")) - unix_micros(col("pd"))).cast("double") /
               (unix_micros(col("nd")) - unix_micros(col("pd"))).cast("double"))), 4)
            .as("v_interp"))
        .orderBy("user_id", "day")
    }
  )
}
