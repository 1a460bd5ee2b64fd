package graft.operators

import graft.Q
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 continuation (SURVEY §2.11bk): the blocked/ordered
  * nonparametric testing family — Friedman, Page's trend-in-blocks,
  * Cochran–Armitage trend-in-proportions, Mood's median, a 2×2 odds
  * ratio with Woolf log-CI, Cochran's Q for matched binary raters, and
  * the pairwise Welch grid that post-hocs q_stat_11's one-way ANOVA.
  *
  * Determinism discipline (§2.12): every rank is a `row_number` with a
  * total (value, key) ordering so ties break identically on both
  * engines; all counts/rank-sums/moment sums are exact BIGINTs; the
  * final statistics are fixed IEEE expressions of those integers,
  * quantized 1e-4/1e-6 at emission. No engine RNG, no HUGEINT leaks
  * (every integer `sum()` is CAST to BIGINT in the oracle).
  */
object Round7kOps {

  private def D(c: org.apache.spark.sql.Column) = c.cast("double")

  val all: Seq[Q] = Seq(

    // Friedman rank test: do the three return-flag classes draw
    // systematically different revenue within customer nations
    // (nation = block, flag = treatment)? Rank sums are integers;
    // Q = 12/(n·k·(k+1))·ΣR² − 3n(k+1) with k=3.
    Q("q_stat_36_friedman",
      """WITH rev AS (
        |  SELECT c_nationkey AS blk, l_returnflag AS trt,
        |   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |full_blk AS (SELECT blk FROM rev GROUP BY blk HAVING count(*) = 3),
        |rk AS (SELECT r.blk, r.trt,
        |  row_number() OVER (PARTITION BY r.blk ORDER BY r.v, r.trt) AS r
        | FROM rev r JOIN full_blk f ON r.blk = f.blk),
        |rs AS (SELECT trt, CAST(sum(r) AS BIGINT) AS rank_sum,
        |  CAST(count(*) AS BIGINT) AS n_blocks FROM rk GROUP BY trt),
        |st AS (SELECT CAST(sum(rank_sum * rank_sum) AS BIGINT) AS s2,
        |  CAST(max(n_blocks) AS BIGINT) AS n FROM rs)
        |SELECT trt, rank_sum, n_blocks,
        | floor((12.0 * s2 / (n * 3 * 4) - 3.0 * n * 4) * 1000000 + 0.5) / 1000000 AS friedman_q
        |FROM rs, st ORDER BY trt""".stripMargin) { (s, d) =>
      // One fact scan → 75-row (nation, flag) aggregate; the rank
      // window partitions by nation (25 partitions × 3 rows). At 100 TB
      // the block aggregate is the only shuffle; everything after is
      // driver-trivial. Ties in exact-cents sums break on flag.
      val li = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val rev = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("blk"), col("l_returnflag").as("trt"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("v"))
      val fullBlk = rev.groupBy("blk").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") === 3).select("blk")
      val rk = rev.join(fullBlk, "blk")
        .withColumn("r", row_number().over(
          Window.partitionBy("blk").orderBy(col("v"), col("trt"))))
      val rs = rk.groupBy("trt")
        .agg(sum("r").as("rank_sum"), count(lit(1)).as("n_blocks"))
      val st = rs.agg(sum(col("rank_sum") * col("rank_sum")).as("s2"),
        max("n_blocks").as("n"))
      rs.crossJoin(broadcast(st))
        .select(col("trt"), col("rank_sum"), col("n_blocks"),
          Num.round(lit(12.0) * col("s2") / (col("n") * 12)
            - lit(3.0) * col("n") * 4, 6).as("friedman_q"))
        .orderBy("trt")
    },

    // Page's L test for an ORDERED alternative: does per-nation order
    // volume trend monotonically across calendar quarters? L = Σ j·R_j
    // is an exact integer; under H0 E[L] = n·k·(k+1)²/4 and
    // Var[L] = n·k²·(k+1)·(k²−1)/144 (k=4).
    Q("q_stat_37_page_trend",
      """WITH cnt AS (
        |  SELECT c_nationkey AS blk, quarter(o_orderdate) AS trt,
        |   CAST(count(*) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |full_blk AS (SELECT blk FROM cnt GROUP BY blk HAVING count(*) = 4),
        |rk AS (SELECT c.blk, c.trt,
        |  row_number() OVER (PARTITION BY c.blk ORDER BY c.v, c.trt) AS r
        | FROM cnt c JOIN full_blk f ON c.blk = f.blk),
        |rs AS (SELECT trt, CAST(sum(r) AS BIGINT) AS rank_sum FROM rk GROUP BY trt),
        |st AS (SELECT CAST(sum(trt * rank_sum) AS BIGINT) AS l_stat,
        |  CAST(max(n) AS BIGINT) AS n FROM rs,
        |  (SELECT CAST(count(*) AS BIGINT) AS n FROM full_blk) b)
        |SELECT n AS n_blocks,
        | CAST(max(CASE WHEN trt = 1 THEN rank_sum END) AS BIGINT) AS rs_q1,
        | CAST(max(CASE WHEN trt = 2 THEN rank_sum END) AS BIGINT) AS rs_q2,
        | CAST(max(CASE WHEN trt = 3 THEN rank_sum END) AS BIGINT) AS rs_q3,
        | CAST(max(CASE WHEN trt = 4 THEN rank_sum END) AS BIGINT) AS rs_q4,
        | l_stat,
        | floor((l_stat - n * 25.0) / sqrt(n * 25.0 / 3) * 10000 + 0.5) / 10000 AS z
        |FROM rs, st GROUP BY n, l_stat""".stripMargin) { (s, d) =>
      // k=4: E[L] = 25n, Var[L] = 25n/3 (constants folded from the
      // general formulas in the scaladoc). Same block-aggregate shape
      // as q_stat_36 — one shuffle, then 100-row algebra.
      val o = Tables(s, d, "orders")
      val c = Tables(s, d, "customer")
      val cnt = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("blk"),
          quarter(col("o_orderdate")).cast("long").as("trt"))
        .agg(count(lit(1)).as("v"))
      val fullBlk = cnt.groupBy("blk").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") === 4).select("blk")
      val rk = cnt.join(fullBlk, "blk")
        .withColumn("r", row_number().over(
          Window.partitionBy("blk").orderBy(col("v"), col("trt"))))
      val rs = rk.groupBy("trt").agg(sum("r").as("rank_sum"))
      val nb = fullBlk.agg(count(lit(1)).as("n"))
      rs.crossJoin(broadcast(nb))
        .agg(max("n").as("n_blocks"),
          max(when(col("trt") === 1, col("rank_sum"))).as("rs_q1"),
          max(when(col("trt") === 2, col("rank_sum"))).as("rs_q2"),
          max(when(col("trt") === 3, col("rank_sum"))).as("rs_q3"),
          max(when(col("trt") === 4, col("rank_sum"))).as("rs_q4"),
          sum(col("trt") * col("rank_sum")).as("l_stat"))
        .select(col("n_blocks"), col("rs_q1"), col("rs_q2"), col("rs_q3"),
          col("rs_q4"), col("l_stat"),
          Num.round((col("l_stat") - col("n_blocks") * lit(25.0))
            / sqrt(col("n_blocks") * lit(25.0) / 3), 4).as("z"))
    },

    // Cochran–Armitage trend in proportions: does the share of FILLED
    // orders trend across the 1..5 priority ladder? T and all its
    // moment inputs are exact BIGINTs; Z² is one IEEE expression.
    Q("q_stat_38_cochran_armitage",
      """WITH g AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS s,
        |   CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |m AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr,
        |  CAST(sum(s * r) AS BIGINT) AS sr, CAST(sum(s * n) AS BIGINT) AS sn,
        |  CAST(sum(s * s * n) AS BIGINT) AS ssn FROM g)
        |SELECT g.s, g.n, g.r,
        | floor(CAST(g.r AS DOUBLE) / g.n * 1000000 + 0.5) / 1000000 AS frac_f,
        | floor((CAST(nn AS DOUBLE) * sr - CAST(rr AS DOUBLE) * sn)
        |   * (CAST(nn AS DOUBLE) * sr - CAST(rr AS DOUBLE) * sn)
        |   / (CAST(rr AS DOUBLE) * (nn - rr) / nn
        |      * (CAST(nn AS DOUBLE) * ssn - CAST(sn AS DOUBLE) * sn))
        |   / nn * 10000 + 0.5) / 10000 AS z2
        |FROM g, m ORDER BY g.s""".stripMargin) { (s, d) =>
      // T = N·Σsr − R·Σsn; Var = p̄(1−p̄)[N·Σs²n − (Σsn)²];
      // Z² = T²/(N²·p̄(1−p̄)·[...]/N)… folded so both engines evaluate
      // the identical expression tree. One 5-row aggregate off one scan.
      val g = Tables(s, d, "orders")
        .groupBy(substring(col("o_orderpriority"), 1, 1).cast("int").as("s"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("r"))
      val m = g.agg(sum("n").as("nn"), sum("r").as("rr"),
        sum(col("s") * col("r")).as("sr"), sum(col("s") * col("n")).as("sn"),
        sum(col("s") * col("s") * col("n")).as("ssn"))
      val t = D(col("nn")) * col("sr") - D(col("rr")) * col("sn")
      val v = D(col("rr")) * (col("nn") - col("rr")) / col("nn") *
        (D(col("nn")) * col("ssn") - D(col("sn")) * col("sn"))
      g.crossJoin(broadcast(m))
        .select(col("s"), col("n"), col("r"),
          Num.round(D(col("r")) / col("n"), 6).as("frac_f"),
          Num.round(t * t / v / col("nn"), 4).as("z2"))
        .orderBy("s")
    },

    // Mood's median test: 2×k table of order values above/at-or-below
    // the grand lower median, by market segment. The median is an ORDER
    // STATISTIC over exact cents (row ⌈N/2⌉), not an interpolating
    // percentile — both engines pick the identical value.
    Q("q_stat_39_mood_median",
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |   c_mktsegment AS seg
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |ranked AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM o),
        |med AS (SELECT cents AS m FROM ranked
        |  WHERE rn = (SELECT CAST(floor((count(*) + 1) / 2) AS BIGINT) FROM o)),
        |cls AS (SELECT seg,
        |  CAST(sum(CASE WHEN cents > (SELECT m FROM med) THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  CAST(sum(CASE WHEN cents <= (SELECT m FROM med) THEN 1 ELSE 0 END) AS BIGINT) AS n_le
        | FROM o GROUP BY seg),
        |mg AS (SELECT CAST(sum(n_above) AS BIGINT) AS ta,
        |  CAST(sum(n_le) AS BIGINT) AS tl,
        |  CAST(sum(n_above + n_le) AS BIGINT) AS nn FROM cls),
        |chi AS (SELECT CAST(sum(
        |   (n_above - CAST(n_above + n_le AS DOUBLE) * ta / nn)
        |   * (n_above - CAST(n_above + n_le AS DOUBLE) * ta / nn)
        |   / (CAST(n_above + n_le AS DOUBLE) * ta / nn)
        |   + (n_le - CAST(n_above + n_le AS DOUBLE) * tl / nn)
        |   * (n_le - CAST(n_above + n_le AS DOUBLE) * tl / nn)
        |   / (CAST(n_above + n_le AS DOUBLE) * tl / nn)) AS DOUBLE) AS c2
        | FROM cls, mg)
        |SELECT seg, n_above, n_le,
        | floor(CAST(n_above + n_le AS DOUBLE) * ta / nn * 10000 + 0.5) / 10000 AS e_above,
        | floor(c2 * 10000 + 0.5) / 10000 AS chi2
        |FROM cls, mg, chi ORDER BY seg""".stripMargin) { (s, d) =>
      // The median is picked by Pipelines.exactRankPick — the
      // range-partitioned exact order statistic (range shuffle on the
      // value, P-row histogram, per-partition local sort) — so no stage
      // ever funnels the orders⋈customer fact through one task; the
      // 2×k algebra is unchanged. chi2's per-cell terms sum over a
      // 5-row frame.
      val o = Tables(s, d, "orders")
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          col("c_mktsegment").as("seg"))
        .localCheckpoint()
      val (_, picks) =
        graft.api.Pipelines.exactRankPick(o, "cents", nn => Seq((nn + 1) / 2))
      val m = picks.values.head
      val cls = o
        .groupBy("seg")
        .agg(sum(when(col("cents") > m, 1L).otherwise(0L)).as("n_above"),
          sum(when(col("cents") <= m, 1L).otherwise(0L)).as("n_le"))
      val mg = cls.agg(sum("n_above").as("ta"), sum("n_le").as("tl"),
        sum(col("n_above") + col("n_le")).as("nn"))
      val withMg = cls.crossJoin(broadcast(mg))
      val eAbove = D(col("n_above") + col("n_le")) * col("ta") / col("nn")
      val eLe = D(col("n_above") + col("n_le")) * col("tl") / col("nn")
      val cell = (col("n_above") - eAbove) * (col("n_above") - eAbove) / eAbove +
        (col("n_le") - eLe) * (col("n_le") - eLe) / eLe
      val chi = withMg.agg(sum(cell).cast("double").as("c2"))
      withMg.crossJoin(broadcast(chi))
        .select(col("seg"), col("n_above"), col("n_le"),
          Num.round(eAbove, 4).as("e_above"),
          Num.round(col("c2"), 4).as("chi2"))
        .orderBy("seg")
    },

    // 2×2 odds ratio with the Woolf log-scale CI: is an urgent/high
    // priority order more likely to be FILLED? CI stays on the log
    // scale (no exp at emission — ln of identical doubles, quantized).
    Q("q_stat_40_odds_ratio",
      """WITH m AS (SELECT
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS d
        | FROM orders)
        |SELECT a, b, c, d,
        | floor(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) * 1000000 + 0.5) / 1000000 AS odds_ratio,
        | floor(ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)) * 1000000 + 0.5) / 1000000 AS ln_or,
        | floor(sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) * 1000000 + 0.5) / 1000000 AS se,
        | floor((ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
        |   - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)) * 1000000 + 0.5) / 1000000 AS ci_lo,
        | floor((ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
        |   + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)) * 1000000 + 0.5) / 1000000 AS ci_hi
        |FROM m""".stripMargin) { (s, d) =>
      // Four conditional counts in one pass; every emitted number is a
      // fixed function of (a,b,c,d).
      val exposed = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      val m = Tables(s, d, "orders").agg(
        sum(when(exposed && col("o_orderstatus") === "F", 1L).otherwise(0L)).as("a"),
        sum(when(exposed && col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("b"),
        sum(when(!exposed && col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c"),
        sum(when(!exposed && col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("d"))
      val orr = D(col("a")) * col("d") / (D(col("b")) * col("c"))
      val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b")
        + lit(1.0) / col("c") + lit(1.0) / col("d"))
      m.select(col("a"), col("b"), col("c"), col("d"),
        Num.round(orr, 6).as("odds_ratio"),
        Num.round(log(orr), 6).as("ln_or"),
        Num.round(se, 6).as("se"),
        Num.round(log(orr) - lit(1.96) * se, 6).as("ci_lo"),
        Num.round(log(orr) + lit(1.96) * se, 6).as("ci_hi"))
    },

    // Cochran's Q: three matched binary indicators per user — is the
    // event type OVER-REPRESENTED for that user (3·c_type > c_total of
    // the three)? Everyone-has-everything incidence (≥1) is degenerate
    // on this fixture (k·N = ΣR² exactly when every R_i ∈ {0,k}); the
    // over-representation design varies by construction (no user can
    // have all three types above their own mean).
    // Q = (k−1)(k·ΣC² − N²) / (k·N − ΣR²), k = 3, all-integer inputs.
    Q("q_stat_41_cochran_q",
      """WITH c AS (
        |  SELECT user_id,
        |   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS ne
        |  FROM events WHERE event_type IN ('click','purchase','error')
        |  GROUP BY 1),
        |x AS (SELECT user_id,
        |  CASE WHEN 3 * nc > nc + np + ne THEN 1 ELSE 0 END AS xc,
        |  CASE WHEN 3 * np > nc + np + ne THEN 1 ELSE 0 END AS xp,
        |  CASE WHEN 3 * ne > nc + np + ne THEN 1 ELSE 0 END AS xe
        | FROM c),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(xc) AS BIGINT) AS c_click,
        |  CAST(sum(xp) AS BIGINT) AS c_purchase,
        |  CAST(sum(xe) AS BIGINT) AS c_error,
        |  CAST(sum(xc + xp + xe) AS BIGINT) AS nn,
        |  CAST(sum((xc + xp + xe) * (xc + xp + xe)) AS BIGINT) AS r2
        | FROM x)
        |SELECT n_blocks, c_click, c_purchase, c_error,
        | floor(2.0 * (3.0 * (CAST(c_click AS DOUBLE) * c_click
        |    + CAST(c_purchase AS DOUBLE) * c_purchase
        |    + CAST(c_error AS DOUBLE) * c_error) - CAST(nn AS DOUBLE) * nn)
        |  / (3.0 * nn - r2) * 1000000 + 0.5) / 1000000 AS q_stat
        |FROM m""".stripMargin) { (s, d) =>
      // One per-user aggregate is the only shuffle; the 3-wide binary
      // matrix folds to five BIGINT moments map-side.
      val c = Tables(s, d, "events")
        .filter(col("event_type").isin("click", "purchase", "error"))
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nc"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("ne"))
      val tot = col("nc") + col("np") + col("ne")
      val x = c.select(
        when(col("nc") * 3 > tot, 1L).otherwise(0L).as("xc"),
        when(col("np") * 3 > tot, 1L).otherwise(0L).as("xp"),
        when(col("ne") * 3 > tot, 1L).otherwise(0L).as("xe"))
      val ri = col("xc") + col("xp") + col("xe")
      val rm = x.agg(count(lit(1)).as("n_blocks"),
        sum("xc").as("c_click"), sum("xp").as("c_purchase"), sum("xe").as("c_error"),
        sum(ri).as("nn"), sum(ri * ri).as("r2"))
      val c2sum = D(col("c_click")) * col("c_click") +
        D(col("c_purchase")) * col("c_purchase") +
        D(col("c_error")) * col("c_error")
      rm.select(col("n_blocks"), col("c_click"), col("c_purchase"), col("c_error"),
          Num.round(lit(2.0) * (lit(3.0) * c2sum - D(col("nn")) * col("nn"))
            / (lit(3.0) * col("nn") - col("r2")), 6).as("q_stat"))
    },

    // Pairwise Welch t grid — the post-hoc companion to q_stat_11's
    // one-way ANOVA on account balances: every ordered segment pair
    // with its mean difference and Welch t. k=5 → 10 bounded rows.
    Q("q_stat_42_pairwise_welch",
      """WITH g AS (
        |  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc,
        |   CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
        |     * CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc2
        |  FROM customer GROUP BY 1)
        |SELECT a.seg AS seg_a, b.seg AS seg_b,
        | floor((CAST(a.sc AS DOUBLE) / a.n - CAST(b.sc AS DOUBLE) / b.n) / 100 * 100 + 0.5) / 100 AS diff_mean,
        | floor((CAST(a.sc AS DOUBLE) / a.n - CAST(b.sc AS DOUBLE) / b.n)
        |  / sqrt(((a.sc2 - CAST(a.sc AS DOUBLE) * a.sc / a.n) / (a.n - 1)) / a.n
        |       + ((b.sc2 - CAST(b.sc AS DOUBLE) * b.sc / b.n) / (b.n - 1)) / b.n)
        |  * 10000 + 0.5) / 10000 AS welch_t
        |FROM g a JOIN g b ON a.seg < b.seg
        |ORDER BY seg_a, seg_b""".stripMargin) { (s, d) =>
      // One 5-row sufficient-statistics aggregate, self-joined k²/2
      // ways — the grid never touches row data twice. diff_mean is in
      // dollars (cents / 100) to keep the emitted scale readable.
      val cents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
      val g = Tables(s, d, "customer")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"), sum(cents).as("sc"),
          sum(cents * cents).as("sc2")).localCheckpoint()
      val a = g.select(col("seg").as("seg_a"), col("n").as("na"),
        col("sc").as("sca"), col("sc2").as("sc2a"))
      val b = g.select(col("seg").as("seg_b"), col("n").as("nb"),
        col("sc").as("scb"), col("sc2").as("sc2b"))
      val diff = D(col("sca")) / col("na") - D(col("scb")) / col("nb")
      val va = (col("sc2a") - D(col("sca")) * col("sca") / col("na")) / (col("na") - 1) / col("na")
      val vb = (col("sc2b") - D(col("scb")) * col("scb") / col("nb")) / (col("nb") - 1) / col("nb")
      a.join(b, col("seg_a") < col("seg_b"))
        .select(col("seg_a"), col("seg_b"),
          Num.round(diff / 100, 2).as("diff_mean"),
          Num.round(diff / sqrt(va + vb), 4).as("welch_t"))
        .orderBy("seg_a", "seg_b")
    }
  )
}
