package graft.operators

import graft.Q
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 continuation (SURVEY §2.11bl): privacy-release depth
  * (t-closeness via ordered EMD, differential-privacy budget planning)
  * plus two reliability estimators — the Nelson–Aalen cumulative
  * hazard twin of q_stat_7's Kaplan–Meier, and a Little's-law
  * L = λW consistency audit of the order pipeline.
  *
  * Determinism discipline (§2.12): EMD folds 1e-9-quantized |cum-diff|
  * integers (never raw doubles) so partial-aggregation order cannot
  * move a sum; hazard terms quantize 1e-6 before the prefix sum
  * (q_stat_7's exact pattern); Little's-law day arithmetic is pure
  * BIGINT overlap algebra. DATE values never leave the plan — months
  * emit as 'yyyy-MM' strings.
  */
object Round7lOps {

  private def D(c: org.apache.spark.sql.Column) = c.cast("double")

  val all: Seq[Q] = Seq(

    // t-closeness of the (nation, segment) QI groups against the
    // ordered sensitive attribute (acctbal $1000 band): EMD between
    // the group's band distribution and the global one,
    // EMD = Σ|CumP − CumQ| / (m−1) over the m global bands. The max
    // over groups IS the release's t.
    Q("q_priv_6_tcloseness",
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS band FROM customer),
        |bands AS (SELECT band, CAST(count(*) AS BIGINT) AS gn FROM c GROUP BY 1),
        |grp AS (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        | FROM c GROUP BY 1, 2),
        |cell AS (SELECT c_nationkey, c_mktsegment, band,
        |  CAST(count(*) AS BIGINT) AS k FROM c GROUP BY 1, 2, 3),
        |grid AS (SELECT g.c_nationkey, g.c_mktsegment, g.n, b.band, b.gn,
        |  CAST(coalesce(ce.k, 0) AS BIGINT) AS k
        | FROM grp g CROSS JOIN bands b
        | LEFT JOIN cell ce ON ce.c_nationkey = g.c_nationkey
        |  AND ce.c_mktsegment = g.c_mktsegment AND ce.band = b.band),
        |cum AS (SELECT c_nationkey, c_mktsegment, n, band,
        |  CAST(sum(k) OVER (PARTITION BY c_nationkey, c_mktsegment
        |    ORDER BY band) AS BIGINT) AS ck,
        |  CAST(sum(gn) OVER (PARTITION BY c_nationkey, c_mktsegment
        |    ORDER BY band) AS BIGINT) AS cg,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bands) AS m,
        |  (SELECT CAST(sum(gn) AS BIGINT) FROM bands) AS nn
        | FROM grid),
        |emd AS (SELECT c_nationkey, c_mktsegment, n,
        |  CAST(sum(CAST(floor(abs(CAST(ck AS DOUBLE) / n
        |    - CAST(cg AS DOUBLE) / nn) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS s9,
        |  CAST(max(m) AS BIGINT) AS m
        | FROM cum GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment, n,
        | floor(CAST(s9 AS DOUBLE) / 1000000000 / (m - 1) * 1000000 + 0.5) / 1000000 AS emd
        |FROM emd ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, d) =>
      // The grid is |groups|×|bands| — both catalog-bounded dims, so
      // the cross join is a broadcast of ~a dozen band rows, never a
      // fact-table blowup. Each |cum-diff| quantizes to a 1e-9 integer
      // BEFORE the per-group sum (float-order-proof); the division by
      // (m−1) happens once per group at emission.
      val c = Tables(s, d, "customer").select(col("c_nationkey"),
        col("c_mktsegment"), floor(col("c_acctbal") / 1000).cast("long").as("band"))
        .localCheckpoint()
      val bands = c.groupBy("band").agg(count(lit(1)).as("gn"))
      val grp = c.groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
      val cell = c.groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(count(lit(1)).as("k"))
      val tot = bands.agg(count(lit(1)).as("m"), sum("gn").as("nn"))
      val grid = grp.crossJoin(broadcast(bands))
        .join(cell, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .withColumn("k", coalesce(col("k"), lit(0L)))
      val wc = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("band")
      val cum = grid.select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        sum("k").over(wc).as("ck"), sum("gn").over(wc).as("cg"))
        .crossJoin(broadcast(tot))
      cum.groupBy("c_nationkey", "c_mktsegment", "n")
        .agg(sum(floor(abs(D(col("ck")) / col("n") - D(col("cg")) / col("nn"))
          * 1000000000L + 0.5).cast("long")).as("s9"),
          max("m").as("m"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          Num.round(D(col("s9")) / 1000000000L / (col("m") - 1), 6).as("emd"))
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // Differential-privacy budget planning for releasing the same QI
    // histogram under ε-DP (Laplace, sensitivity 1, scale b = 1/ε):
    // per candidate ε, how many groups stay usable (expected relative
    // error 1/(ε·n) ≤ 5%) and what total L1 noise the release carries.
    // A deterministic PLANNING table — no noise is sampled.
    Q("q_priv_7_dp_budget",
      """WITH g AS (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2),
        |eps AS (SELECT CAST(unnest(ARRAY[0.1, 0.5, 1.0, 2.0]) AS DOUBLE) AS eps)
        |SELECT eps,
        | CAST(count(*) AS BIGINT) AS n_groups,
        | CAST(sum(CASE WHEN 1.0 / (eps * n) <= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_usable,
        | floor(CAST(sum(CASE WHEN 1.0 / (eps * n) <= 0.05 THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS usable_share,
        | CAST(ceil(20.0 / eps) AS BIGINT) AS min_n_5pct,
        | floor(count(*) / eps * 10000 + 0.5) / 10000 AS exp_l1_noise
        |FROM g, eps GROUP BY eps ORDER BY eps""".stripMargin) { (s, d) =>
      // |groups|×4 literal fan-out over the bounded QI aggregate; the
      // usability rule 1/(ε·n) ≤ 0.05 and the ceil(20/ε) threshold are
      // fixed IEEE expressions of (ε, n) on both engines.
      val g = Tables(s, d, "customer")
        .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
      val usable = when(lit(1.0) / (col("eps") * col("n")) <= 0.05, 1L).otherwise(0L)
      g.withColumn("eps", explode(array(lit(0.1), lit(0.5), lit(1.0), lit(2.0))))
        .groupBy("eps")
        .agg(count(lit(1)).as("n_groups"),
          sum(usable).as("n_usable"),
          Num.round(sum(usable).cast("double") / count(lit(1)), 6).as("usable_share"),
          ceil(lit(20.0) / col("eps")).cast("long").as("min_n_5pct"),
          Num.round(count(lit(1)) / col("eps"), 4).as("exp_l1_noise"))
        .select("eps", "n_groups", "n_usable", "usable_share", "min_n_5pct",
          "exp_l1_noise")
        .orderBy("eps")
    },

    // Nelson–Aalen cumulative hazard — the estimator twin of
    // q_stat_7's Kaplan–Meier on the identical signup→purchase
    // risk-set construction: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, accumulated as
    // 1e-6-quantized integer terms (no float-sum order hazard).
    Q("q_stat_43_nelson_aalen",
      """WITH u AS (SELECT user_id,
        |  min(CASE WHEN event_type='signup' THEN ts::TIMESTAMP END) AS t_s,
        |  max(ts::TIMESTAMP) AS t_max
        | FROM events GROUP BY user_id),
        |p AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t_p
        | FROM events e JOIN u ON e.user_id = u.user_id
        | WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > u.t_s GROUP BY 1),
        |c AS (SELECT CAST(max(floor(epoch(t_max))) AS BIGINT) AS t_end FROM u),
        |subj AS (SELECT CASE WHEN p.t_p IS NOT NULL
        |   THEN CAST(floor((floor(epoch(p.t_p)) - floor(epoch(u.t_s)))/86400) AS BIGINT)
        |   ELSE CAST(floor((c.t_end - floor(epoch(u.t_s)))/86400) AS BIGINT) END AS tt,
        |  CASE WHEN p.t_p IS NOT NULL THEN 1 ELSE 0 END AS ev
        | FROM u LEFT JOIN p ON u.user_id = p.user_id, c
        | WHERE u.t_s IS NOT NULL),
        |g AS (SELECT tt, CAST(sum(ev) AS BIGINT) AS d,
        |  CAST(count(*) AS BIGINT) AS ctot FROM subj GROUP BY tt),
        |r AS (SELECT tt, d, CAST(sum(ctot) OVER () - sum(ctot) OVER (ORDER BY tt)
        |  + ctot AS BIGINT) AS n_risk FROM g),
        |h AS (SELECT tt, d, n_risk,
        |  CAST(sum(CAST(floor(CAST(d AS DOUBLE) / n_risk * 1000000 + 0.5) AS BIGINT))
        |    OVER (ORDER BY tt) AS BIGINT) AS h6 FROM r)
        |SELECT tt, d, n_risk, CAST(h6 AS DOUBLE) / 1000000 AS cum_hazard
        |FROM h WHERE d > 0 ORDER BY tt""".stripMargin) { (s, d) =>
      // Same two event passes as q_stat_7 (per-user stage table +
      // purchase-after-signup join); the hazard increments ride one
      // ordered window over the duration-bounded table.
      val ev = Tables(s, d, "events")
      val u = ev.groupBy("user_id").agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_s"),
        max(col("ts")).as("t_max"))
        .localCheckpoint()
      val p = ev.join(u, Seq("user_id"))
        .filter(col("event_type") === "purchase" && col("ts") > col("t_s"))
        .groupBy("user_id").agg(min("ts").as("t_p"))
      val cEnd = u.agg(max(unix_timestamp(col("t_max"))).as("t_end"))
      val subj = u.filter(col("t_s").isNotNull)
        .join(p, Seq("user_id"), "left")
        .crossJoin(broadcast(cEnd))
        .select(
          when(col("t_p").isNotNull,
            floor((unix_timestamp(col("t_p")) - unix_timestamp(col("t_s"))) / 86400))
            .otherwise(floor((col("t_end") - unix_timestamp(col("t_s"))) / 86400))
            .cast("long").as("tt"),
          when(col("t_p").isNotNull, 1L).otherwise(0L).as("ev"))
      val g = subj.groupBy("tt").agg(sum("ev").as("d"), count(lit(1)).as("ctot"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCum = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = g.select(col("tt"), col("d"),
        (sum("ctot").over(wAll) - sum("ctot").over(wCum) + col("ctot")).as("n_risk"))
      r.select(col("tt"), col("d"), col("n_risk"),
          sum(floor(D(col("d")) / col("n_risk") * 1000000 + 0.5).cast("long"))
            .over(wCum).as("h6"))
        .filter(col("d") > 0)
        .select(col("tt"), col("d"), col("n_risk"),
          (D(col("h6")) / 1000000).as("cum_hazard"))
        .orderBy("tt")
    },

    // Little's-law consistency audit of the order pipeline, by
    // arrival month: average work-in-progress L (integrated in-flight
    // order-days / days) vs arrival rate λ times mean residence W.
    // Stationary months sit near ratio 1; ramp-up/drain months drift —
    // the queueing sanity check every throughput dashboard needs.
    Q("q_stream_41_littles_law",
      """WITH sp AS (SELECT o_orderkey,
        |  datediff('day', DATE '1970-01-01', o_orderdate) AS d0,
        |  (SELECT max(datediff('day', DATE '1970-01-01', l_shipdate))
        |   FROM lineitem WHERE l_orderkey = o_orderkey) AS d1,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        | FROM orders),
        |sp2 AS (SELECT * FROM sp WHERE d1 IS NOT NULL),
        |mon AS (SELECT strftime(o_orderdate, '%Y-%m') AS ym,
        |  CAST(min(datediff('day', DATE '1970-01-01',
        |    date_trunc('month', o_orderdate))) AS BIGINT) AS ms,
        |  CAST(min(datediff('day', DATE '1970-01-01',
        |    date_trunc('month', o_orderdate) + INTERVAL 1 MONTH)) AS BIGINT) AS me
        | FROM orders GROUP BY 1),
        |arr AS (SELECT ym, CAST(count(*) AS BIGINT) AS n_arrivals,
        |  CAST(sum(d1 - d0) AS BIGINT) AS sum_lag FROM sp2 GROUP BY ym),
        |wip AS (SELECT m.ym, CAST(sum(
        |   CASE WHEN least(s.d1, m.me) > greatest(s.d0, m.ms)
        |    THEN least(s.d1, m.me) - greatest(s.d0, m.ms) ELSE 0 END) AS BIGINT) AS od
        | FROM mon m JOIN sp2 s ON s.d0 < m.me AND s.d1 > m.ms GROUP BY m.ym)
        |SELECT a.ym, a.n_arrivals,
        | floor(CAST(a.n_arrivals AS DOUBLE) / (m.me - m.ms) * 10000 + 0.5) / 10000 AS lambda_day,
        | floor(CAST(a.sum_lag AS DOUBLE) / a.n_arrivals * 10000 + 0.5) / 10000 AS w_days,
        | floor(CAST(coalesce(w.od, 0) AS DOUBLE) / (m.me - m.ms) * 10000 + 0.5) / 10000 AS l_avg,
        | floor(CAST(coalesce(w.od, 0) AS DOUBLE) / a.sum_lag * 10000 + 0.5) / 10000 AS little_ratio
        |FROM arr a JOIN mon m ON a.ym = m.ym LEFT JOIN wip w ON a.ym = w.ym
        |WHERE a.sum_lag > 0 ORDER BY 1""".stripMargin) { (s, d) =>
      // Order spans come from one lineitem max-shipdate aggregate; the
      // WIP integral is a RANGE JOIN against the ~80-row month
      // dimension (broadcast — never a fact×fact pair). All overlap
      // arithmetic is BIGINT day algebra; L/(λW) telescopes to
      // Σoverlap / Σlag, which is what's emitted.
      val epoch = lit("1970-01-01")
      val li = Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(datediff(col("l_shipdate"), epoch)).cast("long").as("d1"))
      val sp = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          datediff(col("o_orderdate"), epoch).cast("long").as("d0"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .localCheckpoint()
      val mon = Tables(s, d, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(min(datediff(date_trunc("month", col("o_orderdate")), epoch))
          .cast("long").as("ms"),
          min(datediff(date_trunc("month", col("o_orderdate"))
            + expr("INTERVAL 1 MONTH"), epoch)).cast("long").as("me"))
      val arr = sp.groupBy("ym").agg(count(lit(1)).as("n_arrivals"),
        sum(col("d1") - col("d0")).as("sum_lag"))
      val ovl = least(col("d1"), col("me")) - greatest(col("d0"), col("ms"))
      val wip = broadcast(mon.select(col("ym").as("wym"), col("ms"), col("me")))
        .join(sp, col("d0") < col("me") && col("d1") > col("ms"))
        .groupBy(col("wym"))
        .agg(sum(when(ovl > 0, ovl).otherwise(0L)).as("od"))
      arr.join(mon, "ym")
        .join(wip, col("ym") === col("wym"), "left")
        .withColumn("od", coalesce(col("od"), lit(0L)))
        .filter(col("sum_lag") > 0)
        .select(col("ym"), col("n_arrivals"),
          Num.round(D(col("n_arrivals")) / (col("me") - col("ms")), 4).as("lambda_day"),
          Num.round(D(col("sum_lag")) / col("n_arrivals"), 4).as("w_days"),
          Num.round(D(col("od")) / (col("me") - col("ms")), 4).as("l_avg"),
          Num.round(D(col("od")) / col("sum_lag"), 4).as("little_ratio"))
        .orderBy("ym")
    }
  )
}
