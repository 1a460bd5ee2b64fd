package graft.operators

import graft.Q
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 continuation (SURVEY §2.11bm): SQL-surface completion wave.
  * Lands the one TPC-H shape still missing (Q1 pricing summary, exact
  * cents), then deepens the thin families — sort-null semantics, array
  * set algebra, map merges, the `stack` generator, correlated
  * NOT EXISTS, the LIKE/regex predicate matrix, and the string scalar
  * function battery.
  *
  * Determinism discipline (§2.12): Q1's four money sums fold BIGINT
  * cent/1e-4/1e-6 units (floor(x·100+0.5) at ingest) so no float ever
  * enters a partial aggregate; averages divide the exact integer sums
  * once at emission. Every query ends in a total ORDER BY on its
  * output key.
  */
object Round7mOps {

  private def D(c: org.apache.spark.sql.Column) = c.cast("double")

  /** floor(x*100+0.5) as BIGINT — the 2-dp fixture columns are exact. */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + 0.5).cast("long")

  val all: Seq[Q] = Seq(

    // TPC-H Q1, the pricing summary — the canonical scan-heavy
    // aggregate, completing the q_tpch family's 22-query set. All four
    // money sums are exact integer folds: qty/price/disc/tax become
    // 1e-2-scaled BIGINTs at the scan, disc_price accumulates
    // cents·(100−d) (1e-4 units) and charge cents·(100−d)·(100+t)
    // (1e-6 units), so partial-aggregation order cannot move a bit.
    Q("q_tpch_1_pricing",
      """WITH l AS (SELECT l_returnflag, l_linestatus,
        |  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q2,
        |  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p2,
        |  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d2,
        |  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t2
        | FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'),
        |g AS (SELECT l_returnflag, l_linestatus,
        |  CAST(sum(q2) AS BIGINT) AS sq, CAST(sum(p2) AS BIGINT) AS sp,
        |  CAST(sum(p2 * (100 - d2)) AS BIGINT) AS sd,
        |  CAST(sum(p2 * (100 - d2) * (100 + t2)) AS BIGINT) AS sc,
        |  CAST(sum(d2) AS BIGINT) AS sdisc, CAST(count(*) AS BIGINT) AS n
        | FROM l GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus,
        | floor(CAST(sq AS DOUBLE) / 100 * 100 + 0.5) / 100 AS sum_qty,
        | floor(CAST(sp AS DOUBLE) / 100 * 100 + 0.5) / 100 AS sum_base_price,
        | floor(CAST(sd AS DOUBLE) / 10000 * 100 + 0.5) / 100 AS sum_disc_price,
        | floor(CAST(sc AS DOUBLE) / 1000000 * 100 + 0.5) / 100 AS sum_charge,
        | floor(CAST(sq AS DOUBLE) / 100 / n * 1000000 + 0.5) / 1000000 AS avg_qty,
        | floor(CAST(sp AS DOUBLE) / 100 / n * 1000000 + 0.5) / 1000000 AS avg_price,
        | floor(CAST(sdisc AS DOUBLE) / 100 / n * 1000000 + 0.5) / 1000000 AS avg_disc,
        | n AS count_order
        |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      // One scan, one shuffle on a 6-value key; the pushed shipdate
      // filter reaches the parquet scan. At 100 TB this is the
      // map-side-combine showcase: 6 groups × 32k partials.
      val l = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .select(col("l_returnflag"), col("l_linestatus"),
          cents(col("l_quantity")).as("q2"), cents(col("l_extendedprice")).as("p2"),
          cents(col("l_discount")).as("d2"), cents(col("l_tax")).as("t2"))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("q2").as("sq"), sum("p2").as("sp"),
          sum(col("p2") * (lit(100L) - col("d2"))).as("sd"),
          sum(col("p2") * (lit(100L) - col("d2")) * (lit(100L) + col("t2"))).as("sc"),
          sum("d2").as("sdisc"), count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          Num.round(D(col("sq")) / 100, 2).as("sum_qty"),
          Num.round(D(col("sp")) / 100, 2).as("sum_base_price"),
          Num.round(D(col("sd")) / 10000, 2).as("sum_disc_price"),
          Num.round(D(col("sc")) / 1000000, 2).as("sum_charge"),
          Num.round(D(col("sq")) / 100 / col("n"), 6).as("avg_qty"),
          Num.round(D(col("sp")) / 100 / col("n"), 6).as("avg_price"),
          Num.round(D(col("sdisc")) / 100 / col("n"), 6).as("avg_disc"),
          col("n").as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Sort-null semantics pinned end to end: customers ranked by their
    // (nullable) total order value ASC with NULLS FIRST — Spark's ASC
    // default and DuckDB's default disagree (nulls-first vs nulls-last),
    // so both sides declare the order explicitly. Never-ordered
    // customers lead the page.
    Q("q_sort_6_nulls_order",
      """WITH t AS (SELECT c.c_custkey, c.c_mktsegment,
        |  (SELECT CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |   FROM orders o WHERE o.o_custkey = c.c_custkey) AS tot2
        | FROM customer c),
        |r AS (SELECT c_custkey, c_mktsegment, tot2,
        |  row_number() OVER (ORDER BY tot2 ASC NULLS FIRST, c_custkey) AS rn
        | FROM t)
        |SELECT rn, c_custkey, c_mktsegment,
        | CAST(tot2 AS DOUBLE) / 100 AS total
        |FROM r WHERE rn <= 100 ORDER BY rn""".stripMargin) { (s, d) =>
      // Left join + cent-sum, then a TakeOrdered bottom-100 (the
      // ORDER BY carries asc_nulls_first explicitly; per-partition
      // heads merge on the driver, so the cut is distributed even when
      // the customer dim scales) — the rank window runs over just
      // those 100 rows.
      val tot = Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("tot2"))
      val t = Tables(s, d, "customer")
        .join(tot, col("c_custkey") === col("o_custkey"), "left")
      val w = Window.orderBy(col("tot2").asc_nulls_first, col("c_custkey").asc)
      t.orderBy(col("tot2").asc_nulls_first, col("c_custkey").asc).limit(100)
        .select(row_number().over(w).as("rn"), col("c_custkey"),
          col("c_mktsegment"), (D(col("tot2")) / 100).as("total"))
        .orderBy("rn")
    },

    // Array set algebra: each customer's distinct order-months of 1995
    // vs 1996 as two collected sets; intersect/except/union sizes give
    // the repurchase-calendar profile. Sizes (not arrays) are emitted,
    // so collection order never matters.
    Q("q_arr_5_set_algebra",
      """WITH om AS (SELECT DISTINCT o_custkey AS ck,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m
        | FROM orders WHERE year(o_orderdate) IN (1995, 1996)),
        |f AS (SELECT ck, m,
        |  max(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS h95,
        |  max(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS h96
        | FROM om GROUP BY 1, 2)
        |SELECT ck AS c_custkey,
        | CAST(sum(h95) AS BIGINT) AS n95, CAST(sum(h96) AS BIGINT) AS n96,
        | CAST(sum(CASE WHEN h95 = 1 AND h96 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        | CAST(sum(CASE WHEN h95 = 1 AND h96 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only95,
        | floor(CAST(sum(CASE WHEN h95 = 1 AND h96 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS jaccard
        |FROM f GROUP BY ck ORDER BY ck""".stripMargin) { (s, d) =>
      // collect_set(when(...)) drops the nulls of the other year, so
      // the two per-customer month sets build in ONE aggregation pass;
      // array_intersect/except/union run on ≤12-element arrays — pure
      // per-row compute after the single shuffle.
      val om = Tables(s, d, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .select(col("o_custkey").as("ck"),
          year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      om.groupBy("ck")
        .agg(collect_set(when(col("y") === 1995, col("m"))).as("m95"),
          collect_set(when(col("y") === 1996, col("m"))).as("m96"))
        .select(col("ck").as("c_custkey"),
          size(col("m95")).cast("long").as("n95"),
          size(col("m96")).cast("long").as("n96"),
          size(array_intersect(col("m95"), col("m96"))).cast("long").as("n_common"),
          size(array_except(col("m95"), col("m96"))).cast("long").as("n_only95"),
          Num.round(D(size(array_intersect(col("m95"), col("m96"))))
            / size(array_union(col("m95"), col("m96"))), 6).as("jaccard"))
        .orderBy("c_custkey")
    },

    // Map merge via map_zip_with: per nation, the priority→order-count
    // map of 1995 merged with 1996's (union of keys, null-safe sum),
    // exploded back to rows. The oracle states the semantics as plain
    // conditional aggregation; the Spark side genuinely routes through
    // map_from_entries → map_zip_with → explode.
    Q("q_map_5_zipmerge",
      """SELECT n.n_name, o.o_orderpriority AS priority,
        | CAST(sum(CASE WHEN year(o.o_orderdate) = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS n95,
        | CAST(sum(CASE WHEN year(o.o_orderdate) = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n96,
        | CAST(count(*) AS BIGINT) AS n_sum
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE year(o.o_orderdate) IN (1995, 1996)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // The (nation, priority, year) aggregate is catalog-bounded
      // (25 × 5 × 2); maps are built per nation-year then zipped.
      // map_zip_with's lambda sums null-coalesced counts over the KEY
      // UNION — exactly the outer-join-by-key semantics the oracle
      // writes out longhand.
      val o = Tables(s, d, "orders")
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).as("y"))
      val counts = o.groupBy("n_name", "priority", "y").agg(count(lit(1)).as("n"))
      val m95 = counts.filter(col("y") === 1995).groupBy("n_name")
        .agg(map_from_entries(collect_list(struct(col("priority"), col("n")))).as("m95"))
      val m96 = counts.filter(col("y") === 1996).groupBy("n_name")
        .agg(map_from_entries(collect_list(struct(col("priority"), col("n")))).as("m96"))
      m95.join(m96, Seq("n_name"), "full")
        .select(col("n_name"),
          map_zip_with(
            coalesce(col("m95"),
              map_from_arrays(array().cast("array<string>"), array().cast("array<bigint>"))),
            coalesce(col("m96"),
              map_from_arrays(array().cast("array<string>"), array().cast("array<bigint>"))),
            (_, a, b) => struct(
              coalesce(a, lit(0L)).as("a"),
              coalesce(b, lit(0L)).as("b"))).as("merged"))
        .select(col("n_name"), explode(col("merged")).as(Seq("priority", "ab")))
        .select(col("n_name"), col("priority"),
          col("ab.a").as("n95"), col("ab.b").as("n96"),
          (col("ab.a") + col("ab.b")).as("n_sum"))
        .orderBy("n_name", "priority")
    },

    // The stack() generator — Spark's inline table-generating function —
    // unpivots a 3-metric region scorecard into (metric, value) rows.
    // The oracle is the equivalent 3-branch UNION ALL.
    Q("q_udtf_3_stack",
      """WITH rc AS (SELECT r.r_name, CAST(count(*) AS BIGINT) AS v
        | FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1),
        |rs AS (SELECT r.r_name, CAST(count(*) AS BIGINT) AS v
        | FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1),
        |rn AS (SELECT r.r_name, CAST(count(*) AS BIGINT) AS v
        | FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY 1)
        |SELECT r_name, metric, value FROM (
        | SELECT r_name, 'customers' AS metric, v AS value FROM rc
        | UNION ALL SELECT r_name, 'suppliers', v FROM rs
        | UNION ALL SELECT r_name, 'nations', v FROM rn)
        |ORDER BY r_name, metric""".stripMargin) { (s, d) =>
      // Three broadcast-dim aggregates meet on the 5-row region key;
      // stack(3, ...) is evaluated per region row — a generator, not a
      // join — so the unpivot adds zero shuffles.
      val n = broadcast(Tables(s, d, "nation"))
      val r = broadcast(Tables(s, d, "region"))
      val byRegion = (df: org.apache.spark.sql.DataFrame, key: String) =>
        df.join(n, col(key) === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name").agg(count(lit(1)).as("v"))
      val rc = byRegion(Tables(s, d, "customer"), "c_nationkey")
        .withColumnRenamed("v", "ncust")
      val rs = byRegion(Tables(s, d, "supplier"), "s_nationkey")
        .withColumnRenamed("v", "nsupp")
      val rn = n.join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("nnat"))
      rc.join(rs, "r_name").join(rn, "r_name")
        .selectExpr("r_name",
          "stack(3, 'customers', ncust, 'suppliers', nsupp, 'nations', nnat) AS (metric, value)")
        .orderBy("r_name", "metric")
    },

    // Correlated NOT EXISTS: per market segment, customers who DO order
    // but never above $300k — the "no whale order" cohort. Spark states
    // it as semi ⋈ anti on the same aggregate-free predicates the
    // oracle's EXISTS/NOT EXISTS pair uses.
    Q("q_sub_7_not_exists",
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Both EXISTS branches compile to one shuffle each on o_custkey
      // (left_semi then left_anti) — no correlated re-execution; at
      // scale these are the same hash joins TPC-H Q21/Q22 lean on.
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
        .join(o.filter(col("o_totalprice") > 300000).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    // Predicate-surface matrix: LIKE prefix/suffix/contains/multi-wild
    // and an anchored alternation regex, counted in one scan of part.
    // Pins that Spark's LIKE and Java-regex rlike agree with DuckDB's
    // LIKE and RE2 regexp_matches on this (deliberately RE2-safe)
    // pattern subset.
    Q("q_filter_5_like_matrix",
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        | CAST(sum(CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
        | CAST(sum(CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix,
        | CAST(sum(CASE WHEN p_name LIKE '%bolt' THEN 1 ELSE 0 END) AS BIGINT) AS n_suffix,
        | CAST(sum(CASE WHEN p_name LIKE '%e%o%' THEN 1 ELSE 0 END) AS BIGINT) AS n_multiwild,
        | CAST(sum(CASE WHEN regexp_matches(p_name, '^(red|blue) ') THEN 1 ELSE 0 END) AS BIGINT) AS n_regex,
        | CAST(sum(CASE WHEN p_name NOT LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT) AS n_not_like
        |FROM part""".stripMargin) { (s, d) =>
      // Single scan, no shuffle (global agg): each predicate is a
      // codegen'd conditional over the already-read p_name column.
      val p = Tables(s, d, "part")
      val b = (c: org.apache.spark.sql.Column) => sum(when(c, 1L).otherwise(0L))
      p.agg(count(lit(1)).as("n_total"),
        b(col("p_name").like("%red%")).as("n_contains"),
        b(col("p_name").like("small%")).as("n_prefix"),
        b(col("p_name").like("%bolt")).as("n_suffix"),
        b(col("p_name").like("%e%o%")).as("n_multiwild"),
        b(col("p_name").rlike("^(red|blue) ")).as("n_regex"),
        b(!col("p_name").like("%a%")).as("n_not_like"))
    },

    // String scalar-function battery over the supplier dim: translate /
    // split_part / lpad / reverse / repeat / ascii — the everyday ETL
    // normalizers — pinned for cross-engine equality on 30 rows.
    Q("q_proj_10_string_battery",
      """SELECT s_suppkey,
        | upper(s_name) AS up,
        | reverse(s_name) AS rev,
        | lpad(CAST(s_suppkey AS VARCHAR), 9, '0') AS padded,
        | translate(s_name, '#0', '-x') AS tr,
        | split_part(s_name, '#', 2) AS num_part,
        | repeat(substr(s_name, 1, 1), 3) AS rep3,
        | CAST(ascii(substr(s_name, 1, 1)) AS BIGINT) AS first_ascii,
        | CAST(length(s_name) AS BIGINT) AS name_len
        |FROM supplier ORDER BY s_suppkey LIMIT 30""".stripMargin) { (s, d) =>
      // Pure projection + the pushed-down 30-row limit; every function
      // here is a codegen'd builtin on both engines.
      Tables(s, d, "supplier")
        .select(col("s_suppkey"),
          upper(col("s_name")).as("up"),
          reverse(col("s_name")).as("rev"),
          lpad(col("s_suppkey").cast("string"), 9, "0").as("padded"),
          translate(col("s_name"), "#0", "-x").as("tr"),
          split_part(col("s_name"), lit("#"), lit(2)).as("num_part"),
          repeat(substring(col("s_name"), 1, 1), 3).as("rep3"),
          ascii(substring(col("s_name"), 1, 1)).cast("long").as("first_ascii"),
          length(col("s_name")).cast("long").as("name_len"))
        .orderBy("s_suppkey")
        .limit(30)
    }
  )
}
