package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** §2.4 — aggregation.
  *
  * Scale notes: all groupBys here use Spark's HashAggregate with partial
  * (map-side) aggregation — shuffle volume is O(groups), not O(rows).
  * Low-cardinality keys (returnflag×linestatus = 6 groups) aggregate
  * almost entirely map-side. `collect_list` is the one agg whose state is
  * O(rows-per-group); it is only used on bounded groups (suppliers per
  * nation). Float sums are rounded post-agg per SURVEY §2.12.
  */
object Aggregations {

  val all: Seq[Q] = Seq(

    Q("q_agg_1_global",
      """SELECT count(*) AS cnt, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        | floor((min(l_extendedprice)) * 100 + 0.5) / 100 AS min_price, floor((max(l_extendedprice)) * 100 + 0.5) / 100 AS max_price,
        | floor((avg(l_discount)) * 1000000 + 0.5) / 1000000 AS avg_disc
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"),
        round(avg("l_discount"), 6).as("avg_disc"))
    },

    Q("q_agg_2_group",
      """SELECT l_returnflag, l_linestatus,
        | floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
        | floor((sum(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base,
        | floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS sum_disc,
        | floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100 AS sum_charge,
        | floor((avg(l_quantity)) * 1000000 + 0.5) / 1000000 AS avg_qty,
        | floor((avg(l_extendedprice)) * 10000 + 0.5) / 10000 AS avg_price,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      // TPC-H Q1 shape.
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    Q("q_agg_3_distinct",
      """SELECT count(DISTINCT l_partkey) AS nd_part, count(DISTINCT l_suppkey) AS nd_supp,
        | floor((sum(DISTINCT l_quantity)) * 100 + 0.5) / 100 AS sd_qty
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        round(sum_distinct(col("l_quantity")), 2).as("sd_qty"))
    },

    // HLL implementations differ across engines, so the raw estimate has
    // no stable oracle — instead EACH engine checks its own estimate
    // against its own exact count and emits the band verdict: the hash
    // gate then enforces "exact counts equal AND both approximations
    // in-band" (rsd=0.01 → 5% is a ~5σ band).
    Q("q_agg_4_approx",
      """SELECT count(DISTINCT o_custkey) AS exact_cust,
        | CAST(abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
        |       <= count(DISTINCT o_custkey) * 0.05 AS BIGINT) AS approx_ok
        |FROM orders""".stripMargin) { (s, d) =>
      Tables(s, d, "orders").agg(
        countDistinct(col("o_custkey")).as("exact_cust"),
        (abs(approx_count_distinct(col("o_custkey"), 0.01) - countDistinct(col("o_custkey")))
          <= countDistinct(col("o_custkey")) * lit(0.05)).cast("long").as("approx_ok"))
    },

    Q("q_agg_5_rollup",
      """SELECT CAST(GROUPING(l_returnflag) AS BIGINT) AS g1, CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
        | coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        | floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g1, g2, rf, ls""".stripMargin) { (s, d) =>
      // NULL grouping keys are coalesced to 'ALL' so ordering semantics
      // (Spark NULLS FIRST vs DuckDB NULLS LAST) can never disagree.
      Tables(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping("l_returnflag").cast("long").as("g1"),
          grouping("l_linestatus").cast("long").as("g2"),
          round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          col("g1"), col("g2"),
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("cnt"))
        .orderBy("g1", "g2", "rf", "ls")
    },

    Q("q_agg_6_cube",
      """SELECT CAST(GROUPING(o_orderstatus) AS BIGINT) AS g1, CAST(GROUPING(o_orderpriority) AS BIGINT) AS g2,
        | coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pri,
        | count(*) AS cnt, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g1, g2, st, pri""".stripMargin) { (s, d) =>
      Tables(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping("o_orderstatus").cast("long").as("g1"),
          grouping("o_orderpriority").cast("long").as("g2"),
          count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
        .select(
          col("g1"), col("g2"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("cnt"), col("sum_price"))
        .orderBy("g1", "g2", "st", "pri")
    },

    Q("q_agg_14_groupingsets",
      """SELECT CAST(GROUPING(l_returnflag) AS BIGINT) AS g1, CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
        | coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        | count(*) AS cnt
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g1, g2, rf, ls""".stripMargin) { (s, d) =>
      // Arbitrary grouping sets (not expressible as rollup/cube) via the
      // SQL entry.
      Tables(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""
        SELECT CAST(GROUPING(l_returnflag) AS BIGINT) AS g1, CAST(GROUPING(l_linestatus) AS BIGINT) AS g2,
          coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
          count(*) AS cnt
        FROM lineitem_gs GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g1, g2, rf, ls""")
    },

    Q("q_agg_7_having",
      """SELECT o_custkey, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS spend, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey HAVING floor(sum(o_totalprice) * 100 + 0.5) / 100 > 400000
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      // The HAVING predicate compares the ROUNDED sum — an unrounded
      // double threshold could flip boundary groups between engines
      // (accumulation-order ulps), violating SURVEY §2.12.
      Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("raw_spend"), count(lit(1)).as("n_orders"))
        .filter(col("raw_spend") > 400000)
        .select(col("o_custkey"), round(col("raw_spend"), 2).as("spend"), col("n_orders"))
        .orderBy("o_custkey")
    },

    Q("q_agg_8_collect",
      """SELECT n_name, string_agg(s_name, '|' ORDER BY s_name) AS suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      // collect_list is order-nondeterministic under parallel merge →
      // sort_array canonicalizes; emitted as a joined string so both
      // engines hash identically (array cells are representation-fragile).
      val sup = Tables(s, d, "supplier")
      val nat = Tables(s, d, "nation")
      sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(concat_ws("|", sort_array(collect_list(col("s_name")))).as("suppliers"))
        .orderBy("n_name")
    },

    Q("q_agg_9_stats",
      """SELECT l_returnflag,
        | floor((stddev_samp(l_quantity)) * 1000000 + 0.5) / 1000000 AS sd_qty,
        | floor((var_samp(l_quantity)) * 1000000 + 0.5) / 1000000 AS var_qty,
        | floor((corr(l_quantity, l_discount)) * 1000000 + 0.5) / 1000000 AS corr_qd,
        | floor((covar_samp(l_quantity, l_discount)) * 1000000 + 0.5) / 1000000 AS cov_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Stats run on small-magnitude columns (qty ~25, discount ~0.05) so
      // 6dp rounding absorbs cross-engine accumulation-order ulps.
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
        .orderBy("l_returnflag")
    },

    Q("q_agg_10_minmax_by",
      """SELECT p_brand, priciest, cheapest FROM (
        | SELECT p_brand,
        |  first_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_name DESC) AS priciest,
        |  first_value(p_name) OVER (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_name ASC) AS cheapest,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
        | FROM part) WHERE rn = 1 ORDER BY p_brand""".stripMargin) { (s, d) =>
      // p_retailprice has duplicates → tie-break through a struct ordering
      // key (price, name) so max_by/min_by are deterministic.
      Tables(s, d, "part")
        .groupBy("p_brand")
        .agg(
          max_by(col("p_name"), struct(col("p_retailprice"), col("p_name"))).as("priciest"),
          min_by(col("p_name"), struct(col("p_retailprice"), col("p_name"))).as("cheapest"))
        .orderBy("p_brand")
    },

    Q("q_agg_17_mode",
      """SELECT o_orderpriority, qty_mode, n FROM (
        | SELECT o_orderpriority, l_quantity AS qty_mode, count(*) AS n,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY count(*) DESC, l_quantity) AS rn
        | FROM orders, lineitem WHERE o_orderkey = l_orderkey
        | GROUP BY o_orderpriority, l_quantity)
        |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // Mode via explicit (count desc, value asc) argmax — engines'
      // built-in mode() leaves ties unspecified, this form pins them.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy(col("n").desc, col("qty_mode"))
      Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_quantity").as("qty_mode"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("o_orderpriority", "qty_mode", "n")
        .orderBy("o_orderpriority")
    },

    Q("q_agg_16_approx_percentile",
      """SELECT l_returnflag,
        | floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS exact_p50,
        | CAST(abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
        |       <= quantile_cont(l_extendedprice, 0.5) * 0.02 AS BIGINT) AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // approx_percentile (GK sketch) banded against the exact percentile
      // — mergeable sketch state, the percentile analogue of the HLL pair
      // (q_agg_4/q_udaf_2). Sketch internals differ across engines
      // (Spark GK vs DuckDB t-digest) so the raw estimate has no stable
      // oracle; each engine instead verdicts its own estimate inside the
      // exact p50 ± 2% band and the hash gate compares exact + verdict.
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 2).as("exact_p50"),
          (abs(expr("approx_percentile(l_extendedprice, 0.5, 1000)")
            - expr("percentile(l_extendedprice, 0.5)"))
            <= expr("percentile(l_extendedprice, 0.5)") * lit(0.02)).cast("long").as("approx_ok"))
        .orderBy("l_returnflag")
    },

    Q("q_agg_22_ddsketch",
      """SELECT o_orderpriority,
        | floor(quantile_cont(o_totalprice, 0.5) * 100 + 0.5) / 100 AS exact_p50,
        | CAST(abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
        |       <= quantile_cont(o_totalprice, 0.5) * 0.03 AS BIGINT) AS sketch_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // Custom DDSketch quantile (TypedImperativeAggregate,
      // expressions/DDSketchAgg.scala) banded against the exact
      // percentile — same band-check oracle pattern as q_agg_16, but
      // the sketch carries a GUARANTEED relative-error bound (α=0.02;
      // the 3% band adds interpolation slack), is fully mergeable
      // bucket-wise, and its state is value-range-bounded rather than
      // accuracy-parameter-bounded. Each engine verdicts its own sketch
      // (ours vs DuckDB's t-digest) inside its own exact band.
      graft.expressions.DDSketchAgg.register(s)
      Tables(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("exact_p50"),
          (abs(expr("ddsketch_quantile(o_totalprice, 0.5D)")
            - expr("percentile(o_totalprice, 0.5)"))
            <= expr("percentile(o_totalprice, 0.5)") * lit(0.03)).cast("long").as("sketch_ok"))
        .orderBy("o_orderpriority")
    },

    Q("q_agg_15_moments",
      """SELECT l_returnflag,
        | floor((s1 / n) * 1000000 + 0.5) / 1000000 AS mean,
        | floor((s2 / n - (s1 / n) * (s1 / n)) * 1000000 + 0.5) / 1000000 AS var_pop,
        | floor(((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) / pow(s2 / n - (s1 / n) * (s1 / n), 1.5)) * 1000000 + 0.5) / 1000000 AS skewness,
        | floor(((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) - 3 * pow(s1 / n, 4)) / pow(s2 / n - (s1 / n) * (s1 / n), 2)) * 1000000 + 0.5) / 1000000 AS kurtosis
        |FROM (
        | SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n, sum(l_quantity) AS s1,
        |  sum(l_quantity * l_quantity) AS s2, sum(l_quantity * l_quantity * l_quantity) AS s3,
        |  sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        | FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Higher central moments (population skewness/kurtosis) via raw
      // power sums. l_quantity is integral and s4 ≤ 50⁴·|lineitem| stays
      // far below 2^53, so every sum is EXACT in double on both engines —
      // the derived ratios are bit-deterministic (engines' built-in
      // skewness/kurtosis disagree on sample-vs-population, so the
      // explicit formulation is also the portable one). One map-side-
      // combined hash aggregate; moments merge associatively at any scale.
      val q = col("l_quantity")
      val agged = Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"), sum(q).as("s1"),
          sum(q * q).as("s2"), sum(q * q * q).as("s3"), sum(q * q * q * q).as("s4"))
      val m = col("s1") / col("n")
      val vpop = col("s2") / col("n") - m * m
      agged.select(col("l_returnflag"),
        round(m, 6).as("mean"),
        round(vpop, 6).as("var_pop"),
        round((col("s3") / col("n") - lit(3) * m * (col("s2") / col("n")) + lit(2) * m * m * m)
          / pow(vpop, 1.5), 6).as("skewness"),
        round((col("s4") / col("n") - lit(4) * m * (col("s3") / col("n"))
          + lit(6) * m * m * (col("s2") / col("n")) - lit(3) * pow(m, 4))
          / pow(vpop, 2), 6).as("kurtosis"))
        .orderBy("l_returnflag")
    }
  )
}
