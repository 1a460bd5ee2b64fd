package graft.operators

import graft.Q
import graft.functions.Num.round
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11x): the remaining classic TPC-H
  * decision-support shapes (Q5/Q7/Q8/Q9/Q13/Q17/Q19), adapted to the
  * fixture schemas — there is no partsupp table, so part-cost shapes use
  * `p_retailprice` as the cost basis and lineitem as the part↔supplier
  * bridge (adaptations documented per query).
  *
  * Scale notes: every query keeps the star-join discipline — the
  * lineitem fact shuffles at most once on a join key; nation/region/part
  * dimensions broadcast; every constant filter sits on a raw column so
  * it reaches the Parquet scan. Money sums follow the established
  * `round(sum(...), 2)` ↔ `floor(x*100+0.5)/100` mirror (§2.12).
  */
object Round5oOps {

  val all: Seq[Q] = Seq(

    // Q5: local-supplier volume — revenue inside one region where the
    // supplier and the customer share a nation.
    Q("q_tpch_5_local",
      """SELECT n_name, floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      // The c_nationkey = s_nationkey residual rides the orderkey hash
      // join (never a separate shuffle); nation⋈region collapses to a
      // 5-row broadcast before touching the fact.
      val asiaNation = Tables(s, d, "nation")
        .join(Tables(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val c = Tables(s, d, "customer").select("c_custkey", "c_nationkey")
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val sup = Tables(s, d, "supplier").select("s_suppkey", "s_nationkey")
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q7: volume shipping between two REGIONS, by supplier-region /
    // customer-region / ship-year (the OR'd pair join — adapted from
    // nation pair to region pair so the slice is populated at every
    // fixture SF; the plan shape is identical).
    Q("q_tpch_7_volume",
      """SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM supplier, lineitem, orders, customer, nation sn, nation cn, region sr, region cr
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        | AND s_nationkey = sn.n_nationkey AND c_nationkey = cn.n_nationkey
        | AND sn.n_regionkey = sr.r_regionkey AND cn.n_regionkey = cr.r_regionkey
        | AND ((sr.r_name = 'AMERICA' AND cr.r_name = 'ASIA')
        |   OR (sr.r_name = 'ASIA' AND cr.r_name = 'AMERICA'))
        | AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      // Both nation filters broadcast into the supplier/customer sides
      // BEFORE the fact joins — the OR'd pair predicate never sees the
      // raw fact, it prunes two 1-nation dimension subsets instead.
      val n = Tables(s, d, "nation")
        .join(Tables(s, d, "region").filter(col("r_name").isin("AMERICA", "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name"))
      val sup = Tables(s, d, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("r_name").as("supp_region"))
      val c = Tables(s, d, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("r_name").as("cust_region"))
      val o = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_region") === "AMERICA" && col("cust_region") === "ASIA")
          || (col("supp_region") === "ASIA" && col("cust_region") === "AMERICA"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("supp_region", "cust_region", "l_year")
    },

    // Q8: national market share — the fraction of one region's revenue
    // in a part-type segment that NATION_1's suppliers deliver, by year.
    Q("q_tpch_8_share",
      """WITH base AS (
        | SELECT year(o_orderdate) AS o_year,
        |  l_extendedprice * (1 - l_discount) AS volume,
        |  sn.n_name AS supp_nation
        | FROM part, supplier, lineitem, orders, customer, nation cn, nation sn, region
        | WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND c_nationkey = cn.n_nationkey
        |  AND cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |  AND s_nationkey = sn.n_nationkey AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1999-01-01')
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        | floor((sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) / sum(volume)) * 1000000 + 0.5)
        |   / 1000000 AS mkt_share
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Customer-region prune broadcasts (America customers only);
      // the share is one conditional-sum / sum ratio per year — a
      // single fact pass, no second scan for the denominator.
      val americaCust = Tables(s, d, "customer")
        .join(broadcast(Tables(s, d, "nation")
          .join(Tables(s, d, "region").filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val sup = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val p = Tables(s, d, "part").filter(col("p_type") === "ECONOMY").select("p_partkey")
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(americaCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_1", vol).otherwise(0.0)) / sum(vol), 6)
          .as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9: product-line profit by supplier nation and year. Adaptation:
    // no partsupp, so cost = 60% of p_retailprice per unit (a fixed
    // margin basis) instead of ps_supplycost.
    Q("q_tpch_9_profit",
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        | floor((sum(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity)) * 100 + 0.5) / 100
        |   AS profit
        |FROM part, supplier, lineitem, nation
        |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        | AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // The p_name LIKE prune broadcasts a sub-2000-row part list; the
      // profit expression is computed per fact row in one projection so
      // the aggregate sees a single double column.
      val p = Tables(s, d, "part").filter(col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
      val sup = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          - lit(0.6) * col("p_retailprice") * col("l_quantity")), 2).as("profit"))
        .orderBy("nation", "o_year")
    },

    // Q13: customer distribution — how many customers placed k orders
    // (k including 0), counting only non-LOW priorities.
    Q("q_tpch_13_custdist",
      """WITH c_orders AS (
        | SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        | FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority NOT IN ('5-LOW')
        | GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      // The priority filter lives in the JOIN CONDITION (not a WHERE) so
      // zero-order customers survive with c_count = 0 — the left-outer +
      // double-group-by shape Q13 exists to test. count(o_orderkey)
      // counts non-null matches only.
      val c = Tables(s, d, "customer").select("c_custkey")
      val o = Tables(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
      c.join(o, col("c_custkey") === col("o_custkey")
          && !col("o_orderpriority").isin("5-LOW"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q17: small-quantity-order revenue — average yearly revenue lost if
    // small orders (below 20% of the part's mean quantity) were dropped.
    Q("q_tpch_17_smallqty",
      """SELECT floor((sum(l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
        |FROM lineitem, part,
        | (SELECT l_partkey AS a_partkey,
        |   0.2 * (CAST(sum(l_quantity) AS DOUBLE) / count(*)) AS qty_cut
        |  FROM lineitem GROUP BY l_partkey) a
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#1'
        | AND a_partkey = l_partkey AND l_quantity < qty_cut""".stripMargin) { (s, d) =>
      // The correlated scalar subquery decorrelates to a per-part mean
      // computed once and broadcast (2000 parts) — the fact joins it by
      // partkey, never re-aggregating per probe row. The mean is written
      // sum/count explicitly so both engines evaluate the identical
      // IEEE division (l_quantity is integral → exact sum).
      val cuts = Tables(s, d, "lineitem")
        .groupBy(col("l_partkey").as("a_partkey"))
        .agg((lit(0.2) * (sum("l_quantity").cast("double") / count(lit(1)))).as("qty_cut"))
      val p = Tables(s, d, "part").filter(col("p_brand") === "Brand#1").select("p_partkey")
      Tables(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(cuts), col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < col("qty_cut"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    },

    // Q19: discounted revenue under three OR'd brand × size × quantity
    // bundles — the disjunctive-predicate-pushdown stress shape.
    Q("q_tpch_19_or",
      """SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND (
        |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (s, d) =>
      // The part side pre-filters to the UNION of the three brand/size
      // envelopes (a superset prune that reaches the parquet scan);
      // the exact three-way disjunction runs as the join residual on the
      // broadcast-joined rows. l_quantity bounds push to the fact scan.
      val p = Tables(s, d, "part")
        .filter((col("p_brand") === "Brand#1" && col("p_size").between(1, 15))
          || (col("p_brand") === "Brand#2" && col("p_size").between(1, 25))
          || (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
        .select("p_partkey", "p_brand", "p_size")
      Tables(s, d, "lineitem")
        .filter(col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11))
            || (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20))
            || (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30)))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }
  )
}
