package graft.operators

import graft.Q
import graft.functions.TextFunctions.tokens
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3e additions (SURVEY §2.11h): regression and dependence
  * statistics — the "is this feature predictive / are these columns
  * related" questions a curation team asks right after the
  * distribution tests of §2.11g — plus the Zipf diagnostic that tells
  * you whether a token-frequency profile looks like natural language.
  *
  * Shared discipline (the q_stat_2 precedent, unchanged): every
  * sufficient statistic is an exact BIGINT (cents ×100, 1e-6 log
  * quanta) aggregated with integer addition — order-insensitive across
  * partitionings — and each query ends in ONE fixed-shape IEEE
  * expression mirrored verbatim in the DuckDB oracle. The OLS closed
  * form multiplies its BIGINT statistics as DOUBLE because n·Σxy
  * crosses 2^63 at corpus scale (same reason as q_text_24's ln
  * argument).
  */
object Round3eOps {

  /** Shared fixed-shape OLS closed form over exact BIGINT sufficient
    * statistics (n, Σx, Σy, Σxy, Σx²): slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²),
    * intercept = (Σy − slope·Σx)/n. `slopeDiv`/`interceptDiv` undo the
    * input quantization units (slope's cancels when x and y share a
    * unit; intercept is always in y's unit). Emits 1e-6-rounded
    * `slope`/`intercept`.
    */
  private def olsClosedForm(df: org.apache.spark.sql.DataFrame,
                            slopeDiv: Double, interceptDiv: Double) = {
    val n = col("n").cast("double"); val sx = col("sx").cast("double")
    val sy = col("sy").cast("double"); val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    df.withColumn("slope", floor(slope / slopeDiv * 1000000 + 0.5) / 1000000)
      .withColumn("intercept",
        floor((sy - slope * sx) / n / interceptDiv * 1000000 + 0.5) / 1000000)
  }

  val all: Seq[Q] = Seq(

    Q("q_stat_5_ols",
      """WITH s AS (SELECT l_returnflag AS grp,
        |                  CAST(l_quantity AS BIGINT) AS x,
        |                  CAST(floor(l_extendedprice*100+0.5) AS BIGINT) AS y
        |           FROM lineitem),
        |st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |              CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
        |       FROM s GROUP BY grp)
        |SELECT grp, n,
        | floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |     / 100 * 1000000 + 0.5) / 1000000 AS slope,
        | floor((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |     / CAST(n AS DOUBLE) / 100 * 1000000 + 0.5) / 1000000 AS intercept
        |FROM st ORDER BY grp""".stripMargin) { (s, d) =>
      // Group-wise least-squares regression of extendedprice (cents) on
      // quantity: ONE scan, one group-by producing the five exact BIGINT
      // sufficient statistics, then the closed form as a 3-row
      // projection. Per-row x·y ≤ 5e8 so Σxy stays ~1e14 at sf0.1 (and
      // ~1e17 at sf100) — exact; only the n·Σxy cross term needs DOUBLE.
      // This is the map-side-combinable shape that scales: no row ever
      // leaves its partition before the 5-number reduction.
      val st = Tables(s, d, "lineitem")
        .select(col("l_returnflag").as("grp"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      olsClosedForm(st, slopeDiv = 100.0, interceptDiv = 100.0)
        .select(col("grp"), col("n"), col("slope"), col("intercept"))
        .orderBy("grp")
    },

    Q("q_stat_6_mutualinfo",
      """WITH cells AS (SELECT o_orderstatus AS x, o_orderpriority AS y, CAST(count(*) AS BIGINT) AS c
        |               FROM orders GROUP BY 1,2),
        |w AS (SELECT c,
        |             CAST(sum(c) OVER (PARTITION BY x) AS BIGINT) AS cx,
        |             CAST(sum(c) OVER (PARTITION BY y) AS BIGINT) AS cy,
        |             CAST(sum(c) OVER () AS BIGINT) AS n FROM cells),
        |q AS (SELECT n, CAST(floor(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)
        |        * ln(CAST(c AS DOUBLE)*CAST(n AS DOUBLE)/(CAST(cx AS DOUBLE)*CAST(cy AS DOUBLE)))
        |        * 1000000 + 0.5) AS BIGINT) AS contrib_q FROM w)
        |SELECT n, CAST(count(*) AS BIGINT) AS n_cells,
        |       CAST(sum(contrib_q) AS DOUBLE)/1000000 AS mi_nats
        |FROM q GROUP BY n""".stripMargin) { (s, d) =>
      // Mutual information I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))
      // between order status and priority — the dependence screen for
      // categorical column pairs (χ²'s information-theoretic cousin,
      // and the column-level analogue of q_text_24's token PMI). ONE
      // scan: the contingency table is |X|·|Y|-bounded, so both
      // marginals AND the grand total ride it as windows; per-cell
      // contributions are 1e-6-quantized to BIGINT before the final
      // sum, so the reduction is integer and order-free. Negative
      // cells (p12 < p1·p2) round with the same floor(x+0.5) half-up
      // convention in both engines.
      val cells = Tables(s, d, "orders")
        .groupBy(col("o_orderstatus").as("x"), col("o_orderpriority").as("y"))
        .agg(count(lit(1)).as("c"))
      val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cD = col("c").cast("double"); val nD = col("n").cast("double")
      cells
        .withColumn("cx", sum("c").over(Window.partitionBy("x")))
        .withColumn("cy", sum("c").over(Window.partitionBy("y")))
        .withColumn("n", sum("c").over(wAll))
        .select(col("n"),
          floor(cD / nD * log(cD * nD / (col("cx").cast("double") * col("cy").cast("double")))
            * 1000000 + 0.5).cast("long").as("contrib_q"))
        .groupBy("n")
        .agg(count(lit(1)).as("n_cells"),
          (sum("contrib_q").cast("double") / 1000000).as("mi_nats"))
        .select(col("n"), col("n_cells"), col("mi_nats"))
    },

    Q("q_text_25_zipf",
      """WITH tf AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |            FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents) GROUP BY token),
        |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank FROM tf
        |       QUALIFY rank <= 1000),
        |pt AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE))*1000000+0.5) AS BIGINT) AS xq,
        |              CAST(floor(ln(CAST(cnt AS DOUBLE))*1000000+0.5) AS BIGINT) AS yq FROM rk),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        |              CAST(sum(xq*yq) AS BIGINT) AS sxy, CAST(sum(xq*xq) AS BIGINT) AS sxx FROM pt)
        |SELECT n,
        | floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS slope,
        | floor((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |     / CAST(n AS DOUBLE) / 1000000 * 1000000 + 0.5) / 1000000 AS intercept
        |FROM st""".stripMargin) { (s, d) =>
      // Zipf rank–frequency fit: OLS slope of ln(freq) on ln(rank) over
      // the top-1000 vocabulary — natural-language corpora sit near
      // slope ≈ −1, so a drifting slope is a cheap corpus-health alarm
      // (boilerplate/spam flattens it, truncation steepens it). The
      // regression points are 1e-6-quantized BIGINT log-coordinates, so
      // the OLS sufficient statistics stay exact integers; xq·yq ≤
      // ~2e14 and the point set is capped at 1000 rows, so sums are
      // overflow-safe unconditionally. The global rank window reduces a
      // VOCAB-sized table (not the corpus); intercept's unit divisor is
      // 1e6 (micro-log y back to nats).
      val tf = Tables(s, d, "documents")
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val rk = tf
        .withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("token").asc)))
        .filter(col("rank") <= 1000)
      val pt = rk.select(
        floor(log(col("rank").cast("double")) * 1000000 + 0.5).cast("long").as("xq"),
        floor(log(col("cnt").cast("double")) * 1000000 + 0.5).cast("long").as("yq"))
      val st = pt.agg(count(lit(1)).as("n"), sum("xq").as("sx"), sum("yq").as("sy"),
        sum(col("xq") * col("yq")).as("sxy"), sum(col("xq") * col("xq")).as("sxx"))
      olsClosedForm(st, slopeDiv = 1.0, interceptDiv = 1000000.0)
        .select(col("n"), col("slope"), col("intercept"))
    },

    Q("q_agg_30_assoc",
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |            FROM lineitem JOIN part ON l_partkey = p_partkey),
        |pairs AS (SELECT x.b AS b1, y.b AS b2, CAST(count(*) AS BIGINT) AS c12
        |          FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b GROUP BY 1,2),
        |m AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM ob GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS no FROM ob),
        |sc AS (SELECT b1, b2, c12,
        |        CAST(floor(CAST(c12 AS DOUBLE)/CAST(no AS DOUBLE)*1000000+0.5) AS BIGINT) AS sup6,
        |        CAST(floor(CAST(c12 AS DOUBLE)*CAST(no AS DOUBLE)/(CAST(m1.cb AS DOUBLE)*CAST(m2.cb AS DOUBLE))*1000000+0.5) AS BIGINT) AS lift6
        |       FROM pairs JOIN m m1 ON pairs.b1 = m1.b JOIN m m2 ON pairs.b2 = m2.b, n
        |       WHERE c12 >= 50)
        |SELECT b1, b2, c12, CAST(sup6 AS DOUBLE)/1000000 AS support, CAST(lift6 AS DOUBLE)/1000000 AS lift, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT *, row_number() OVER (ORDER BY lift6 DESC, b1, b2) AS rn FROM sc)
        |WHERE rn <= 20 ORDER BY rn""".stripMargin) { (s, d) =>
      // Market-basket association rules: top-20 brand pairs co-bought
      // within an order, ranked by lift = p12/(p1·p2) with a min-support
      // threshold — the classic affinity-mining primitive (and, on
      // corpora, the domain-cooccurrence screen for mixture design).
      // The basket table (order, brand) is localCheckpoint'ed ONCE and
      // feeds the pair self-join, both marginals, and the total — the
      // q_dedup_7 lineage-truncation pattern; without it the
      // lineitem⋈part subtree replays 4×. The self-join is
      // orderkey-partitioned (baskets are small: pairs-per-order ≤
      // brands²/2); marginal joins are brand-bounded broadcasts; the
      // dims broadcast under AQE sizing. Ordering by the quantized
      // integer (lift6, b1, b2) — total and engine-stable.
      val ob = Tables(s, d, "lineitem")
        .join(Tables(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .distinct()
        .localCheckpoint()
      val pairs = ob.as("x").join(ob.as("y"),
          col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
        .groupBy(col("x.b").as("b1"), col("y.b").as("b2"))
        .agg(count(lit(1)).as("c12"))
      val m = ob.groupBy(col("b")).agg(count(lit(1)).as("cb"))
      val no = ob.select(countDistinct("ok").as("no"))
      // marginals are |brands|-bounded (dimension, not corpus, scale) —
      // safe to broadcast, unlike the corpus-derived hints q_text_16 dropped
      val sc = pairs
        .join(broadcast(m.select(col("b").as("b1"), col("cb").as("cb1"))), Seq("b1"))
        .join(broadcast(m.select(col("b").as("b2"), col("cb").as("cb2"))), Seq("b2"))
        .crossJoin(no)
        .filter(col("c12") >= 50)
        .select(col("b1"), col("b2"), col("c12"),
          floor(col("c12").cast("double") / col("no").cast("double") * 1000000 + 0.5)
            .cast("long").as("sup6"),
          floor(col("c12").cast("double") * col("no").cast("double")
            / (col("cb1").cast("double") * col("cb2").cast("double")) * 1000000 + 0.5)
            .cast("long").as("lift6"))
      sc.withColumn("rn", row_number().over(Window.orderBy(col("lift6").desc, col("b1"), col("b2"))))
        .filter(col("rn") <= 20)
        .select(col("b1"), col("b2"), col("c12"),
          (col("sup6").cast("double") / 1000000).as("support"),
          (col("lift6").cast("double") / 1000000).as("lift"),
          col("rn").cast("long").as("rn"))
        .orderBy("rn")
    },

    Q("q_stream_13_markov",
      """WITH seq AS (SELECT event_type AS a,
        |                    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS b
        |             FROM events),
        |tr AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM seq WHERE b IS NOT NULL GROUP BY 1,2)
        |SELECT a, b, c, CAST(sum(c) OVER (PARTITION BY a) AS BIGINT) AS c_a,
        |       floor(CAST(c AS DOUBLE)/CAST(sum(c) OVER (PARTITION BY a) AS DOUBLE)*1000000+0.5)/1000000 AS p
        |FROM tr ORDER BY a, b""".stripMargin) { (s, d) =>
      // First-order Markov transition matrix over each user's event
      // sequence: P(next = b | current = a) — the session-behavior
      // model behind next-event prediction and anomaly scoring (and
      // q_text_16's bigram LM lifted from tokens to events). ONE scan:
      // a per-user lead window (ordered by (ts, event_id) — event_id
      // breaks timestamp ties deterministically), a |types|²-bounded
      // count aggregate, and row totals riding that table as a window
      // (no re-aggregation branch). Probabilities quantized to 1e-6.
      val seq = Tables(s, d, "events")
        .select(col("event_type").as("a"),
          lead(col("event_type"), 1).over(
            Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))).as("b"))
      val tr = seq.filter(col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("c"))
      tr.withColumn("c_a", sum("c").over(Window.partitionBy("a")))
        .select(col("a"), col("b"), col("c"), col("c_a"),
          (floor(col("c").cast("double") / col("c_a").cast("double") * 1000000 + 0.5) / 1000000).as("p"))
        .orderBy("a", "b")
    },
  )
}
