package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11ag): operator-surface completeness
  * — null-safe join semantics, an event-order inversion audit, a
  * multiset-algebra identity check, exact DECIMAL aggregation, and
  * calendar-gap statistics.
  *
  * Determinism discipline (§2.12): every output is integer counts, an
  * exact DECIMAL(18,2) rendered at fixed scale, or a single IEEE ratio
  * of integers.
  */
object Round5xOps {

  val all: Seq[Q] = Seq(

    // Null-safe equality (<=>) vs strict equality: error events get a
    // NULL bucket key; the null-safe join matches NULL to NULL (one
    // bucket), strict equality drops those rows entirely — the
    // SQL-semantics corner every ETL join on nullable keys hits.
    Q("q_join_20_null_safe",
      """WITH a AS (SELECT event_id,
        |  CASE WHEN event_type = 'error' THEN NULL
        |       ELSE CAST(json_extract(props, '$.k') AS BIGINT) % 10 END AS bk
        | FROM events WHERE event_id % 7 = 0),
        |b AS (SELECT CASE WHEN t.b = 10 THEN NULL ELSE t.b END AS bk,
        |  'bucket_' || CASE WHEN t.b = 10 THEN 'null' ELSE CAST(t.b AS VARCHAR) END AS label
        | FROM (SELECT unnest(range(0, 11)) AS b) t)
        |SELECT
        | (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b ON a.bk IS NOT DISTINCT FROM b.bk) AS n_null_safe,
        | (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b ON a.bk = b.bk) AS n_strict,
        | (SELECT CAST(count(*) AS BIGINT) FROM a WHERE bk IS NULL) AS n_null_keys""".stripMargin) { (s, d) =>
      // Spark's <=> compiles to EqualNullSafe — still a hash-joinable
      // key (null hashes to its own bucket), so this is a broadcast
      // hash join, not a nested loop. n_null_safe − n_strict must equal
      // n_null_keys exactly.
      val a = Tables(s, d, "events").filter(col("event_id") % 7 === 0)
        .select(col("event_id"),
          when(col("event_type") === "error", lit(null).cast("long"))
            .otherwise(get_json_object(col("props"), "$.k").cast("long") % 10).as("bk"))
        .localCheckpoint()
      val b = s.range(0, 11)
        .select(when(col("id") === 10, lit(null).cast("long")).otherwise(col("id")).as("bbk"),
          concat(lit("bucket_"),
            when(col("id") === 10, lit("null")).otherwise(col("id").cast("string"))).as("label"))
      val nullSafe = a.join(broadcast(b), col("bk") <=> col("bbk")).agg(count(lit(1)).as("n_null_safe"))
      val strict = a.join(broadcast(b), col("bk") === col("bbk")).agg(count(lit(1)).as("n_strict"))
      val nulls = a.filter(col("bk").isNull).agg(count(lit(1)).as("n_null_keys"))
      nullSafe.crossJoin(strict).crossJoin(nulls)
    },

    // Event-order inversion audit: for a deterministic user sample, how
    // often does event_id order disagree with timestamp order — the
    // clock-skew / out-of-order-ingestion detector (0 inversions means
    // the id sequence is a valid event-time ordering).
    Q("q_dq_30_inversions",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events WHERE user_id % 10 = 0),
        |p AS (SELECT a.user_id, CAST(count(*) AS BIGINT) AS inv
        | FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
        |   AND (a.us > b.us OR (a.us = b.us AND a.event_id > b.event_id))
        | GROUP BY 1),
        |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1)
        |SELECT n.user_id, n.n, coalesce(p.inv, 0) AS inversions,
        | floor(CAST(coalesce(p.inv, 0) AS DOUBLE) / (n.n * (n.n - 1) / 2) * 1000000 + 0.5) / 1000000 AS inv_rate
        |FROM n LEFT JOIN p ON n.user_id = p.user_id
        |ORDER BY inversions DESC, n.user_id LIMIT 15""".stripMargin) { (s, d) =>
      // Pair generation is PER USER on a 1-in-10 hash sample (the
      // q_graph_7 bounding pattern — inversion counting is inherently
      // O(per-key n²) pairwise; at scale the merge-sort inversion count
      // would replace it, or the sample rate drops). Counts are pure
      // integers; the rate is one IEEE ratio.
      val e = Tables(s, d, "events").filter(col("user_id") % 10 === 0)
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
        .localCheckpoint()
      val b = e.select(col("user_id").as("u2"), col("event_id").as("id2"), col("us").as("us2"))
      val p = e.join(b, col("user_id") === col("u2") && col("event_id") < col("id2")
          && (col("us") > col("us2") || (col("us") === col("us2") && col("event_id") > col("id2"))))
        .groupBy("user_id").agg(count(lit(1)).as("inv"))
      val n = e.groupBy(col("user_id").as("nu")).agg(count(lit(1)).as("n"))
      n.join(p, col("nu") === col("user_id"), "left_outer")
        .select(col("nu").as("user_id"), col("n"),
          coalesce(col("inv"), lit(0L)).as("inversions"),
          (floor(coalesce(col("inv"), lit(0L)).cast("double")
            / (col("n") * (col("n") - 1) / 2) * 1000000 + 0.5) / 1000000).as("inv_rate"))
        .orderBy(col("inversions").desc, col("user_id")).limit(15)
    },

    // Multiset-algebra identity: |A| = |A ∩ₐₗₗ B| + |A ∖ₐₗₗ B| per
    // event type, with A/B the two half-window event multisets — the
    // bag-semantics conservation law (q_set_4/5 exercise the operators;
    // this pins the algebra they must satisfy).
    Q("q_set_7_multiset_identity",
      """WITH bounds AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
        |a AS (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
        |      WHERE epoch_us(ts) * 2 < (SELECT lo + hi FROM bounds)),
        |b AS (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
        |      WHERE epoch_us(ts) * 2 >= (SELECT lo + hi FROM bounds)),
        |ia AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM
        |       (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1),
        |ea AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM
        |       (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1),
        |na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM a GROUP BY 1)
        |SELECT na.event_type, na.c AS n_a,
        | coalesce(ia.c, 0) AS n_intersect_all, coalesce(ea.c, 0) AS n_except_all,
        | CAST(CASE WHEN na.c = coalesce(ia.c, 0) + coalesce(ea.c, 0) THEN 1 ELSE 0 END AS BIGINT) AS identity_holds
        |FROM na LEFT JOIN ia ON na.event_type = ia.event_type
        |LEFT JOIN ea ON na.event_type = ea.event_type
        |ORDER BY na.event_type""".stripMargin) { (s, d) =>
      // INTERSECT ALL / EXCEPT ALL over the (type, k) multisets — both
      // are single hash shuffles on the row value in Spark; the
      // identity column must be 1 for every type (pinned by the oracle
      // AND by the spec as an algebraic law).
      val ev = Tables(s, d, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"),
          expr("unix_micros(ts)").as("us"))
        .localCheckpoint()
      val lohi = ev.agg((min("us") + max("us")).as("lohi"))
      val tagged = ev.crossJoin(broadcast(lohi))
      val a = tagged.filter(col("us") * 2 < col("lohi")).select("event_type", "k")
      val b = tagged.filter(col("us") * 2 >= col("lohi")).select("event_type", "k")
      val ia = a.intersectAll(b).groupBy(col("event_type").as("it")).agg(count(lit(1)).as("ic"))
      val ea = a.exceptAll(b).groupBy(col("event_type").as("et")).agg(count(lit(1)).as("ec"))
      val na = a.groupBy("event_type").agg(count(lit(1)).as("n_a"))
      na.join(ia, col("event_type") === col("it"), "left_outer")
        .join(ea, col("event_type") === col("et"), "left_outer")
        .select(col("event_type"), col("n_a"),
          coalesce(col("ic"), lit(0L)).as("n_intersect_all"),
          coalesce(col("ec"), lit(0L)).as("n_except_all"),
          when(col("n_a") === coalesce(col("ic"), lit(0L)) + coalesce(col("ec"), lit(0L)), 1L)
            .otherwise(0L).as("identity_holds"))
        .orderBy("event_type")
    },

    // Exact DECIMAL aggregation: totals as DECIMAL(18,2) rendered at
    // fixed scale — the money-typed path (the double+cents discipline
    // everywhere else is a workaround; this is the typed answer, and
    // the string rendering pins that both engines carry the EXACT
    // decimal, not a binary approximation).
    Q("q_proj_9_decimal_exact",
      """SELECT o_orderpriority,
        | CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(18,2))) AS VARCHAR) AS total_dec,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // DECIMAL sums are exact in both engines (128-bit accumulation);
      // rendering at scale 2 gives a canonical string on both sides.
      // o_totalprice is double in the fixtures: the cast to DECIMAL(18,2)
      // rounds each VALUE once (same half-up rule both engines), then
      // accumulation is exact integer arithmetic.
      Tables(s, d, "orders")
        .select(col("o_orderpriority"),
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("dec"))
        .groupBy("o_orderpriority")
        .agg(sum("dec").cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("string")
          .as("total_dec"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Calendar-gap statistics: the missing-HOUR run-length histogram of
    // the purchase series — q_time_1's spine fills the gaps; this
    // audits them (a growing max gap is a data-delivery incident). The
    // hourly grid keeps the audit live on fixtures whose purchases
    // cover every day.
    Q("q_time_17_gap_stats",
      """WITH h AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS hh
        | FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT hh - lag(hh) OVER (ORDER BY hh) - 1 AS gap FROM h)
        |SELECT CAST(gap AS BIGINT) AS gap_hours, CAST(count(*) AS BIGINT) AS n_runs
        |FROM g WHERE gap IS NOT NULL AND gap > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // One lag window over the distinct-hour table (calendar-bounded);
      // pure integer hour arithmetic.
      val h = Tables(s, d, "events").filter(col("event_type") === "purchase")
        .select(expr("unix_micros(ts) div 3600000000").as("hh")).distinct()
      val g = h.select((col("hh") - lag("hh", 1).over(Window.orderBy("hh")) - 1).as("gap"))
      g.filter(col("gap").isNotNull && col("gap") > 0)
        .groupBy(col("gap").cast("long").as("gap_hours"))
        .agg(count(lit(1)).as("n_runs"))
        .orderBy("gap_hours")
    }
  )
}
