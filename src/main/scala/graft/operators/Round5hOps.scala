package graft.operators

import graft.Q
import graft.functions.Num.round
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-5 continuation (SURVEY §2.11q): robust distribution shape,
  * week-over-week volume monitoring, ranking agreement, IDF drift,
  * regression inference, LSH parameter sweeping, and SimHash radius
  * profiling.
  *
  * Determinism discipline (§2.12, unchanged): exact BIGINT sufficient
  * statistics everywhere a float would otherwise accumulate across rows;
  * per-term transcendentals floor-quantized to integers BEFORE cross-row
  * sums; squares that can outgrow int64 ride DECIMAL(38,0)/HUGEINT; one
  * fixed-shape IEEE expression per emitted float, mirrored verbatim in
  * DuckDB; total ORDER BY everywhere multi-row.
  */
object Round5hOps {

  // DuckDB mirrors of TextFunctions.shingles(2)/shingleMinhashSignature
  // and simhash32 (same forms as TextOps' private helpers).
  private val duckTokenHashes: String =
    "list_transform(list_distinct(string_split(text, ' ')), t -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * 31 + c) % 1000000007))"
  private val duckShingles2: String =
    "list_distinct(list_transform(range(0, len(string_split(text, ' ')) - 1), i -> string_split(text, ' ')[i + 1] || ' ' || string_split(text, ' ')[i + 2]))"
  private val duckShingleHashes: String =
    s"list_transform($duckShingles2, t -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * 31 + c) % 1000000007))"
  private val duckShingleSig: String =
    s"list_transform(range(0, 16), i -> list_min(list_transform($duckShingleHashes, h -> (h * (i * 2 + 3) + (i * 5 + 7)) % 1000000007)))"
  private val duckSimhash: String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 30)), (acc, j) -> acc +
       |  CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), $duckTokenHashes), (a, h) -> a + (h // CAST(pow(2, j) AS BIGINT)) % 2 * 2 - 1) > 0
       |   THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("q_agg_36_quartile_shape",
      """WITH c AS (SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x FROM orders),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, o_orderkey) AS BIGINT) AS rn, CAST(count(*) OVER () AS BIGINT) AS n FROM c),
        |q AS (SELECT CAST(max(n) AS BIGINT) AS n,
        | CAST(min(CASE WHEN rn = (n + 3) // 4 THEN x END) AS BIGINT) AS q1,
        | CAST(min(CASE WHEN rn = (n + 1) // 2 THEN x END) AS BIGINT) AS q2,
        | CAST(min(CASE WHEN rn = (3 * n + 3) // 4 THEN x END) AS BIGINT) AS q3
        | FROM r)
        |SELECT n, floor(CAST(q1 AS DOUBLE) / 100 * 100 + 0.5) / 100 AS q1v,
        | floor(CAST(q2 AS DOUBLE) / 100 * 100 + 0.5) / 100 AS q2v,
        | floor(CAST(q3 AS DOUBLE) / 100 * 100 + 0.5) / 100 AS q3v,
        | floor(CAST(q3 - q1 AS DOUBLE) / 100 * 100 + 0.5) / 100 AS iqr,
        | floor(CAST(q1 + q3 AS DOUBLE) / 2 / 100 * 100 + 0.5) / 100 AS midhinge,
        | floor(CAST(q1 + q3 - 2 * q2 AS DOUBLE) / CAST(q3 - q1 AS DOUBLE) * 1000000 + 0.5) / 1000000 AS bowley_skew
        |FROM q""".stripMargin) { (s, d) =>
      // Robust distribution-shape summary of order value: exact-lower
      // quartiles (⌈q·n⌉-th order statistics — no interpolation float),
      // IQR, midhinge, and Bowley's quartile skewness (Q₁+Q₃−2Q₂)/IQR —
      // the outlier-immune shape triple beside q_agg_15's moment
      // skewness (Bowley saturates in [−1,1] and ignores tails
      // entirely). All quartiles are exact integers picked by
      // Pipelines.exactRankPick (range shuffle on the value, P-row
      // histogram, per-partition local sort — no one-task global
      // sort); the three shape numbers are closed-form rationals.
      val c = Tables(s, d, "orders").select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("x"))
      val (n, picks) = graft.api.Pipelines.exactRankPick(c, "x",
        nn => Seq((nn + 3) / 4, (nn + 1) / 2, (3 * nn + 3) / 4))
      import s.implicits._
      val q = Seq((n, picks((n + 3) / 4), picks((n + 1) / 2), picks((3 * n + 3) / 4)))
        .toDF("n", "q1", "q2", "q3")
      q.select(col("n"),
        round(col("q1").cast("double") / 100, 2).as("q1v"),
        round(col("q2").cast("double") / 100, 2).as("q2v"),
        round(col("q3").cast("double") / 100, 2).as("q3v"),
        round((col("q3") - col("q1")).cast("double") / 100, 2).as("iqr"),
        round((col("q1") + col("q3")).cast("double") / 2 / 100, 2).as("midhinge"),
        round((col("q1") + col("q3") - lit(2) * col("q2")).cast("double")
          / (col("q3") - col("q1")).cast("double"), 6).as("bowley_skew"))
    },

    Q("q_dq_26_volume_wow",
      """WITH w AS (SELECT event_type, epoch_us(ts) // 604800000000 AS week, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |b AS (SELECT CAST(min(week) AS BIGINT) AS w0 FROM w),
        |l AS (SELECT event_type, week, n, lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev FROM w)
        |SELECT event_type, CAST(week AS BIGINT) AS week, n, CAST(prev AS BIGINT) AS prev_n,
        | floor((CAST(n AS DOUBLE) - prev) / prev * 1000000 + 0.5) / 1000000 AS wow_change,
        | CAST(CASE WHEN CAST(n AS DOUBLE) < 0.8 * prev THEN 1 ELSE 0 END AS BIGINT) AS drop_alert
        |FROM l, b WHERE prev IS NOT NULL AND week > b.w0 + 1 ORDER BY event_type, week""".stripMargin) { (s, d) =>
      // Week-over-week volume monitor per event type: count, previous
      // week, relative change, and a >20%-drop alert — the coarse-grain
      // upstream-outage tripwire that complements q_dq_25's staleness
      // (staleness sees a stream STOP; this sees it SHRINK). The first
      // full week after the partial boundary week is excluded from
      // comparison (a partial week's jump is calendar noise, stated —
      // week > min_week + 1). Counts exact; the change is one IEEE
      // division; the alert threshold compares in double identically
      // both engines. Scale: (type, week) map-side agg, then lag over
      // the tiny week table.
      val w = Tables(s, d, "events")
        .groupBy(col("event_type"), expr("unix_micros(ts) div 604800000000").as("week"))
        .agg(count(lit(1)).as("n"))
      val b = w.agg(min("week").as("w0"))
      val l = w.withColumn("prev",
        lag("n", 1).over(Window.partitionBy("event_type").orderBy("week")))
      l.crossJoin(broadcast(b))
        .filter(col("prev").isNotNull && col("week") > col("w0") + 1)
        .select(col("event_type"), col("week").cast("long").as("week"), col("n"),
          col("prev").cast("long").as("prev_n"),
          round((col("n").cast("double") - col("prev")) / col("prev"), 6).as("wow_change"),
          when(col("n").cast("double") < lit(0.8) * col("prev"), 1L).otherwise(0L).as("drop_alert"))
        .orderBy("event_type", "week")
    },

    Q("q_ret_7_topk_overlap",
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents FROM events GROUP BY 1),
        |rv AS (SELECT user_id, row_number() OVER (ORDER BY cents DESC, user_id) AS rr FROM u),
        |rc AS (SELECT user_id, row_number() OVER (ORDER BY cnt DESC, user_id) AS rr FROM u),
        |tv AS (SELECT user_id FROM rv WHERE rr <= 50), tc AS (SELECT user_id FROM rc WHERE rr <= 50),
        |ov AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM tv JOIN tc USING (user_id))
        |SELECT CAST(50 AS BIGINT) AS k, nc AS n_common,
        | floor(CAST(nc AS DOUBLE) / (100 - nc) * 1000000 + 0.5) / 1000000 AS jaccard,
        | floor(CAST(nc AS DOUBLE) / 50 * 1000000 + 0.5) / 1000000 AS overlap_at_k
        |FROM ov""".stripMargin) { (s, d) =>
      // Top-k ranking agreement: do "top-50 users by total value" and
      // "top-50 by event count" select the same population? Overlap@k
      // and Jaccard@k — the cheap whole-list agreement check beside
      // q_stat_10's Kendall (which correlates FULL rankings; a high tau
      // can still hide head disagreement, which is what segmentation
      // and reward models actually consume). Both rankings order by
      // (metric DESC, user_id) so the sets are engine-deterministic;
      // all counts exact. Scale: one user-table pass + two TakeOrdered
      // top-50s (per-partition heads merged on the driver — never a
      // global sort) + a 50-row semi-join.
      val u = Tables(s, d, "events").groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
        .localCheckpoint()
      val tv = u.orderBy(col("cents").desc, col("user_id")).limit(50).select("user_id")
      val tc = u.orderBy(col("cnt").desc, col("user_id")).limit(50).select("user_id")
      tv.join(tc, "user_id").agg(count(lit(1)).as("nc"))
        .select(lit(50L).as("k"), col("nc").as("n_common"),
          round(col("nc").cast("double") / (lit(100) - col("nc")), 6).as("jaccard"),
          round(col("nc").cast("double") / 50, 6).as("overlap_at_k"))
    },

    Q("q_text_40_idf_drift",
      """WITH h AS (SELECT doc_id, text, (doc_id % 1000000007) * 2654435761 % 1000000007 % 2 AS half FROM documents),
        |d AS (SELECT half, CAST(count(*) AS BIGINT) AS nd FROM h GROUP BY 1),
        |tok AS (SELECT DISTINCT half, doc_id, unnest(string_split(text, ' ')) AS tok FROM h),
        |df AS (SELECT tok, CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |  CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS df1 FROM tok GROUP BY 1),
        |n AS (SELECT max(CASE WHEN half = 0 THEN nd END) AS n0, max(CASE WHEN half = 1 THEN nd END) AS n1 FROM d),
        |sh AS (SELECT tok, df0, df1,
        |  CAST(floor(ln(CAST(n.n0 + 1 AS DOUBLE) / (df0 + 1)) * 1000000 + 0.5) AS BIGINT)
        |  - CAST(floor(ln(CAST(n.n1 + 1 AS DOUBLE) / (df1 + 1)) * 1000000 + 0.5) AS BIGINT) AS shiftq
        | FROM df, n),
        |r AS (SELECT tok, df0, df1, shiftq, row_number() OVER (ORDER BY abs(shiftq) DESC, tok) AS rnk FROM sh)
        |SELECT CAST(rnk AS BIGINT) AS rnk, tok, df0, df1, CAST(shiftq AS DOUBLE) / 1000000 AS idf_shift
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin) { (s, d) =>
      // IDF drift between two deterministic corpus halves: the 20
      // tokens whose smoothed IDF moved most — the vocabulary-level
      // drift detector that says WHICH terms changed when q_dq_18's PSI
      // or q_text_32's JSD says "something drifted" (a term going
      // common→rare across an ingest boundary usually means a source
      // mix or boilerplate change). Per-half smoothed IDFs are
      // floor-quantized to 1e-6 integers BEFORE differencing, so the
      // rank is an exact-integer argsort with a token tiebreak. Scale:
      // one exploded distinct scan to the df table; the rank runs on
      // the vocab table.
      val h = Tables(s, d, "documents").select(col("doc_id"), col("text"),
        (col("doc_id") % 1000000007L * 2654435761L % 1000000007L % 2).as("half"))
        .localCheckpoint()
      val dcnt = h.groupBy("half").agg(count(lit(1)).as("nd"))
      val n = dcnt.agg(max(when(col("half") === 0, col("nd"))).as("n0"),
        max(when(col("half") === 1, col("nd"))).as("n1"))
      val tok = h.select(col("half"), col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
      val df = tok.groupBy("tok").agg(
        sum(when(col("half") === 0, 1).otherwise(0)).cast("long").as("df0"),
        sum(when(col("half") === 1, 1).otherwise(0)).cast("long").as("df1"))
      val sh = df.crossJoin(broadcast(n))
        .select(col("tok"), col("df0"), col("df1"),
          (floor(log((col("n0") + 1).cast("double") / (col("df0") + 1)) * 1000000L + 0.5).cast("long")
            - floor(log((col("n1") + 1).cast("double") / (col("df1") + 1)) * 1000000L + 0.5).cast("long"))
            .as("shiftq"))
      // TakeOrdered top-20 over the vocab-scale shift table, then the
      // rank window over just 20 rows
      sh.orderBy(abs(col("shiftq")).desc, col("tok")).limit(20)
        .withColumn("rnk", row_number().over(Window.orderBy(abs(col("shiftq")).desc, col("tok"))).cast("long"))
        .select(col("rnk"), col("tok"), col("df0"), col("df1"),
          (col("shiftq").cast("double") / 1000000L).as("idf_shift"))
        .orderBy("rnk")
    },

    Q("q_stat_21_ols_inference",
      """WITH s AS (SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y FROM lineitem),
        |st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx, sum(CAST(y AS HUGEINT) * y) AS syy FROM s GROUP BY grp),
        |f AS (SELECT grp, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) AS cov,
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS vx,
        |  (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS vy
        | FROM st)
        |SELECT grp, n,
        | floor(cov / vx / 100 * 1000000 + 0.5) / 1000000 AS slope,
        | floor(sqrt((vy - cov * cov / vx) / (n - 2) / vx) / 100 * 1000000 + 0.5) / 1000000 AS slope_se,
        | floor(cov / vx / sqrt((vy - cov * cov / vx) / (n - 2) / vx) * 1000000 + 0.5) / 1000000 AS t_stat,
        | floor((cov / vx - 1.959964 * sqrt((vy - cov * cov / vx) / (n - 2) / vx)) / 100 * 1000000 + 0.5) / 1000000 AS ci_lo,
        | floor((cov / vx + 1.959964 * sqrt((vy - cov * cov / vx) / (n - 2) / vx)) / 100 * 1000000 + 0.5) / 1000000 AS ci_hi
        |FROM f ORDER BY grp""".stripMargin) { (s, d) =>
      // OLS slope INFERENCE per group: standard error, t statistic, and
      // 95% CI for q_stat_5's price-on-quantity regression — the "is
      // the slope real" layer q_stat_5 deliberately omits. Uses the
      // closed-form identity SSE = (Svy − cov²/Svx)/n so the residual
      // variance needs NO second pass: the only new sufficient
      // statistic is Σy² (cents² outgrows int64 at sf0.1 → DECIMAL(38,
      // 0)/HUGEINT). SE, t, CI are fixed IEEE expressions with the
      // shared z literal 1.959964. Scale: same one-scan map-side
      // 6-number reduction as q_stat_5.
      val st = Tables(s, d, "lineitem")
        .select(col("l_returnflag").as("grp"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
      val nD = col("n").cast("double")
      val cov = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
      val vx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
      val vy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
      val se = sqrt((vy - cov * cov / vx) / (col("n") - 2) / vx)
      st.select(col("grp"), col("n"),
          round(cov / vx / 100, 6).as("slope"),
          round(se / 100, 6).as("slope_se"),
          round(cov / vx / se, 6).as("t_stat"),
          round((cov / vx - lit(1.959964) * se) / 100, 6).as("ci_lo"),
          round((cov / vx + lit(1.959964) * se) / 100, 6).as("ci_hi"))
        .orderBy("grp")
    },

    Q("q_dedup_14_lsh_sweep",
      s"""WITH sigs AS (SELECT doc_id, $duckShingleSig AS sig FROM documents WHERE doc_id < 100),
         |cfg AS (SELECT * FROM (VALUES (2, 8), (4, 4), (8, 2)) AS t(b, r)),
         |bands AS (SELECT c.b, c.r, s.doc_id, j,
         |  md5(array_to_string(list_transform(list_slice(s.sig, j * c.r + 1, j * c.r + c.r), x -> CAST(x AS VARCHAR)), '-')) AS bk
         | FROM sigs s, cfg c, (SELECT unnest(range(0, 8)) AS j) WHERE j < c.b),
         |pairs AS (SELECT DISTINCT a.b, a.r, a.doc_id AS da, x.doc_id AS db
         | FROM bands a JOIN bands x ON a.b = x.b AND a.r = x.r AND a.j = x.j AND a.bk = x.bk AND a.doc_id < x.doc_id),
         |cnt AS (SELECT b, r, CAST(count(*) AS BIGINT) AS n_pairs FROM pairs GROUP BY 1, 2)
         |SELECT CAST(c.b AS BIGINT) AS bands, CAST(c.r AS BIGINT) AS rows_per_band,
         | floor(pow(1.0 / c.b, 1.0 / c.r) * 1000000 + 0.5) / 1000000 AS threshold,
         | COALESCE(cnt.n_pairs, 0) AS n_candidate_pairs
         |FROM cfg c LEFT JOIN cnt ON c.b = cnt.b AND c.r = cnt.r ORDER BY bands""".stripMargin) { (s, d) =>
      // LSH parameter sweep: candidate-pair yield of MinHash(16) over
      // BIGRAM shingles at (bands, rows) ∈ {(2,8), (4,4), (8,2)} with
      // each config's s-curve threshold (1/b)^(1/r) — the tuning table
      // a dedup pipeline reads before committing a config (more bands ⇒
      // lower threshold ⇒ more candidates; this fixture yields a
      // properly monotone 47/58/73 at sf0.01). Shingles, not unigram
      // token sets: the fixture's 31-word vocabulary makes unigram-set
      // signatures saturate identically for every config (measured —
      // the unigram key space is the degenerate regime the sweep
      // exists to detect). Pair sets are exact DISTINCT counts; the
      // threshold is one IEEE pow. Scale: the doc_id<100 bound is the
      // eval-set pattern; each config's join shuffles band keys only.
      val sub = Tables(s, d, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TextFunctions.shingleMinhashSignature(col("text"), 2, 16).as("sig"))
        .localCheckpoint()
      val configs = Seq((2, 8), (4, 4), (8, 2))
      val perCfg: Seq[DataFrame] = configs.map { case (b, r) =>
        val bands = sub.select(col("doc_id"),
            explode(sequence(lit(0), lit(b - 1))).as("j"), col("sig"))
          .select(col("doc_id"), col("j"),
            md5(concat_ws("-", transform(
              slice(col("sig"), col("j") * r + 1, lit(r)), _.cast("string")))).as("bk"))
        val x = bands.select(col("doc_id").as("db"), col("j").as("j2"), col("bk").as("bk2"))
        val nPairs = bands.join(x,
            col("j") === col("j2") && col("bk") === col("bk2") && col("doc_id") < col("db"))
          .select(col("doc_id"), col("db")).distinct()
          .agg(count(lit(1)).as("n_candidate_pairs"))
        nPairs.select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          round(pow(lit(1.0) / b, lit(1.0) / r), 6).as("threshold"),
          col("n_candidate_pairs"))
      }
      perCfg.reduce(_ union _).orderBy("bands")
    },

    Q("q_dedup_15_hamming_radius",
      s"""WITH hs AS (SELECT doc_id, $duckSimhash AS sim FROM documents),
         |probe AS (SELECT sim AS psim FROM hs WHERE doc_id = 0),
         |dd AS (SELECT doc_id, bit_count(xor(sim, psim)) AS ham FROM hs, probe),
         |g AS (SELECT ham // 4 AS bucket, CAST(count(*) AS BIGINT) AS n, CAST(min(ham) AS BIGINT) AS mn, CAST(max(ham) AS BIGINT) AS mx FROM dd GROUP BY 1)
         |SELECT CAST(bucket AS BIGINT) AS bucket, n, mn AS min_hamming, mx AS max_hamming
         |FROM g ORDER BY bucket""".stripMargin) { (s, d) =>
      // SimHash radius profile: histogram of Hamming distances from a
      // probe document's 30-bit SimHash (q_dedup_4's fingerprint) in
      // buckets of 4 bits — the calibration view that says where to set
      // the near-dup Hamming threshold BEFORE running a full pairwise
      // screen (the probe's near-dup shell is the mass in the first
      // bucket(s); on this narrow-vocabulary fixture most docs sit 4–7
      // bits out, exactly the saturation q_dedup_14's sweep flags).
      // Distance is bit_count(xor) — exact integers end to end. Scale:
      // one broadcast probe row against a per-row projection; the only
      // shuffle is the ≤8-bucket agg.
      val hs = Tables(s, d, "documents")
        .select(col("doc_id"), TextFunctions.simhash32(col("text")).as("sim"))
      val probe = hs.filter(col("doc_id") === 0).select(col("sim").as("psim"))
      val dd = hs.crossJoin(broadcast(probe))
        .select(col("doc_id"), bit_count(col("sim").bitwiseXOR(col("psim"))).as("ham"))
      dd.groupBy(expr("ham div 4").as("bucket"))
        .agg(count(lit(1)).as("n"), min("ham").cast("long").as("min_hamming"),
          max("ham").cast("long").as("max_hamming"))
        .select(col("bucket").cast("long").as("bucket"), col("n"),
          col("min_hamming"), col("max_hamming"))
        .orderBy("bucket")
    }
  )
}
