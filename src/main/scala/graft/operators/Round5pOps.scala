package graft.operators

import graft.Q
import graft.functions.Num.round
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11y): the second half of the TPC-H
  * completion — the subquery-heavy shapes Q2/Q11/Q15/Q16/Q20/Q21/Q22,
  * adapted to the fixture schemas (no partsupp: the part↔supplier
  * relation and unit costs are derived from lineitem; no comment
  * columns: the exclusion predicates use s_acctbal).
  *
  * Determinism discipline (§2.12): every threshold comparison that the
  * textbook writes as `x > frac * aggregate` is rewritten as an exact
  * INTEGER cross-multiplication over cents/quantity sums (e.g.
  * `1000 * part_cents > total_cents`), so no float boundary can flip a
  * row between engines. Money outputs quantize cents pre-sum.
  */
object Round5pOps {

  val all: Seq[Q] = Seq(

    // Q2: min-cost supplier per part — supply cost adapted to the
    // supplier's observed mean unit price on that part (exact
    // cents-sum / integral-quantity-sum, one IEEE division).
    Q("q_tpch_2_mincost",
      """WITH cost AS (
        | SELECT l_partkey AS ck, l_suppkey AS sk,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        | FROM lineitem GROUP BY 1, 2),
        |ranked AS (
        | SELECT ck, sk, CAST(floor(CAST(cents AS DOUBLE) / qty * 1000000 + 0.5) AS BIGINT) AS cost6,
        |  row_number() OVER (PARTITION BY ck ORDER BY CAST(floor(CAST(cents AS DOUBLE) / qty * 1000000 + 0.5) AS BIGINT), sk) AS rn
        | FROM cost
        | WHERE sk IN (SELECT s_suppkey FROM supplier, nation, region
        |              WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |                AND r_name = 'EUROPE'))
        |SELECT p_partkey, p_name, sk AS s_suppkey,
        | cost6 / 1000000.0 AS unit_cost
        |FROM ranked, part
        |WHERE rn = 1 AND p_partkey = ck AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // The correlated min-subquery decorrelates to ONE (part, supplier)
      // aggregation + a per-part row_number window — the fact shuffles
      // once on (partkey, suppkey), the window on partkey rides the
      // same hash partitioning family. European suppliers broadcast as
      // a left_semi prune BEFORE the window so non-region rows never
      // rank. cost6 is an exact scaled integer: the ORDER BY can't tie
      // on float noise, and sk breaks genuine ties.
      val euroSupp = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")
          .join(Tables(s, d, "region").filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val cost = Tables(s, d, "lineitem")
        .select(col("l_partkey").as("ck"), col("l_suppkey").as("sk"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("lc"),
          col("l_quantity").cast("long").as("lq"))
        .join(broadcast(euroSupp), col("sk") === col("s_suppkey"), "left_semi")
        .groupBy("ck", "sk")
        .agg(sum("lc").as("cents"), sum("lq").as("qty"))
        .withColumn("cost6",
          floor(col("cents").cast("double") / col("qty") * 1000000 + 0.5).cast("long"))
      val ranked = cost.withColumn("rn",
        row_number().over(Window.partitionBy("ck").orderBy(col("cost6"), col("sk"))))
        .filter(col("rn") === 1)
      val p = Tables(s, d, "part")
        .filter(col("p_type") === "STANDARD" && col("p_size").between(10, 20))
        .select("p_partkey", "p_name")
      ranked.join(broadcast(p), col("ck") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("sk").as("s_suppkey"),
          (col("cost6") / 1000000.0).as("unit_cost"))
        .orderBy("p_partkey")
    },

    // Q11: important stock — parts whose nation-supplied inventory value
    // exceeds 0.1% of the nation's total (exact integer threshold).
    Q("q_tpch_11_stock",
      """WITH v AS (
        | SELECT l_partkey AS pk,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS val_cents
        | FROM lineitem, part, supplier, nation
        | WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        | GROUP BY 1),
        |t AS (SELECT CAST(sum(val_cents) AS BIGINT) AS total_cents FROM v)
        |SELECT pk AS p_partkey, floor(CAST(val_cents AS DOUBLE) / 100 * 100 + 0.5) / 100 AS value
        |FROM v, t WHERE 1000 * val_cents > total_cents
        |ORDER BY val_cents DESC, pk""".stripMargin) { (s, d) =>
      // The HAVING-over-grand-total shape: the per-part aggregation runs
      // once; its one-row total broadcasts back as a cross join (never a
      // second fact scan). `1000 * val_cents > total_cents` is the exact
      // integer form of `val > 0.001 * total` — no float boundary.
      val n3supp = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val p = Tables(s, d, "part")
        .select(col("p_partkey"), floor(col("p_retailprice") * 100 + 0.5).cast("long").as("rc"))
      val v = Tables(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(n3supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long") * col("rc")).as("val_cents"))
      val t = v.agg(sum("val_cents").as("total_cents"))
      v.crossJoin(broadcast(t))
        .filter(lit(1000) * col("val_cents") > col("total_cents"))
        .select(col("pk").as("p_partkey"),
          round(col("val_cents").cast("double") / 100, 2).as("value"),
          col("val_cents"))
        .orderBy(col("val_cents").desc, col("p_partkey"))
        .drop("val_cents")
    },

    // Q15: top supplier(s) — revenue == the quarter's max revenue,
    // compared on exact cents so ties are genuine ties.
    Q("q_tpch_15_topsupp",
      """WITH r AS (
        | SELECT l_suppkey AS sk,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        | GROUP BY 1)
        |SELECT s_suppkey, s_name,
        | floor(CAST(rev_cents AS DOUBLE) / 100 * 100 + 0.5) / 100 AS total_revenue
        |FROM r, supplier
        |WHERE s_suppkey = sk AND rev_cents = (SELECT max(rev_cents) FROM r)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      // The view + scalar-max shape: one fact aggregation; the scalar
      // max comes from a broadcast 1-row aggregate of the SAME supplier
      // aggregate (ReuseExchange dedups the shared groupBy exchange, so
      // the fact scan still runs once) rather than an unpartitioned
      // window — the supplier aggregate scales with SF, and a window
      // would funnel it through one task.
      val r = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-04-01").cast("timestamp")
          // explicit, so BOTH uses of this plan canonicalize equal —
          // the supplier join infers isnotnull(sk) on one branch only,
          // which otherwise blocks AQE stage reuse (measured r9)
          && col("l_suppkey").isNotNull)
        .groupBy(col("l_suppkey").as("sk"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long")).as("rev_cents"))
      val withMax = r.crossJoin(broadcast(r.agg(max("rev_cents").as("mx"))))
        .filter(col("rev_cents") === col("mx"))
      withMax.join(broadcast(Tables(s, d, "supplier").select("s_suppkey", "s_name")),
          col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("rev_cents").cast("double") / 100, 2).as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // Q16: supplier count per part attribute group — the part↔supplier
    // relation derived from lineitem; negative-balance suppliers
    // excluded (the complaints-filter adaptation).
    Q("q_tpch_16_partsupp",
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1'
        | AND p_size IN (1, 14, 23, 45)
        | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      // NOT IN over a key column with no NULLs → left_anti broadcast;
      // count(DISTINCT supp) per attribute group shuffles the deduped
      // (brand, type, size, supp) projection once — Spark's two-phase
      // distinct-agg keeps the map side partial.
      val badSupp = Tables(s, d, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey")
      val p = Tables(s, d, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 14, 23, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      Tables(s, d, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // Q20: dominant suppliers — suppliers in one REGION that shipped
    // MORE THAN HALF of some part's 1997 volume (exact integer compare;
    // region instead of nation so the slice is populated at every SF).
    Q("q_tpch_20_excess",
      """WITH q AS (
        | SELECT l_partkey AS pk, l_suppkey AS sk,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | GROUP BY 1, 2),
        |tot AS (SELECT pk, CAST(sum(sq) AS BIGINT) AS tq FROM q GROUP BY 1)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM q, tot, supplier, nation, region
        |WHERE q.pk = tot.pk AND 2 * q.sq > tot.tq
        | AND q.sk = s_suppkey AND s_nationkey = n_nationkey
        | AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      // The EXISTS-chain decorrelates to: (part, supp) volumes → part
      // totals (a second agg over the SMALL aggregate, not the fact) →
      // exact 2·sq > tq dominance test → distinct suppliers. The
      // nation prune broadcasts into the final 100-row join.
      val q = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
      val tot = q.groupBy("pk").agg(sum("sq").as("tq"))
      val n2supp = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")
          .join(Tables(s, d, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      q.join(tot.withColumnRenamed("pk", "tpk"), col("pk") === col("tpk"))
        .filter(lit(2) * col("sq") > col("tq"))
        .join(broadcast(n2supp), col("sk") === col("s_suppkey"))
        .select("s_suppkey", "s_name").distinct()
        .orderBy("s_suppkey")
    },

    // Q21: suppliers who kept orders waiting — the ONLY late supplier
    // (ship > order date + 45d) in a multi-supplier order.
    Q("q_tpch_21_waiting",
      """WITH f AS (
        | SELECT l_orderkey AS ok, l_suppkey AS sk,
        |  max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY THEN 1 ELSE 0 END) AS late
        | FROM lineitem, orders
        | WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
        | GROUP BY 1, 2),
        |o AS (SELECT ok, CAST(count(*) AS BIGINT) AS n_supp,
        |  CAST(sum(late) AS BIGINT) AS n_late FROM f GROUP BY 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM f, o, supplier
        |WHERE f.ok = o.ok AND f.late = 1 AND o.n_supp >= 2 AND o.n_late = 1
        | AND f.sk = s_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin) { (s, d) =>
      // The notorious EXISTS/NOT-EXISTS pair collapses to two small
      // aggregations: per-(order, supplier) lateness, then per-order
      // supplier/late counts — supplier S waits iff S is late, the
      // order has ≥2 suppliers, and S is the only late one. One fact
      // shuffle on orderkey; everything downstream is aggregate-sized.
      val o = Tables(s, d, "orders").filter(col("o_orderstatus") === "F")
        .withColumn("cut", col("o_orderdate") + expr("INTERVAL 45 DAY"))
        .select("o_orderkey", "cut")
      val f = Tables(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max(when(col("l_shipdate") > col("cut"), 1).otherwise(0)).as("late"))
      val per = f.groupBy("ok")
        .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
      f.join(per.withColumnRenamed("ok", "pok"), col("ok") === col("pok"))
        .filter(col("late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
        .join(broadcast(Tables(s, d, "supplier").select("s_suppkey", "s_name")),
          col("sk") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(10)
    },

    // Q22: global sales opportunity — rich customers (above the mean
    // positive balance, exact cross-multiplied compare) INACTIVE since
    // 1999 (the fixtures give every customer some order, so "no orders
    // ever" is empty at every SF; "no recent orders" is the live form).
    Q("q_tpch_22_global",
      """WITH c AS (
        | SELECT c_custkey, c_nationkey,
        |  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        | FROM customer WHERE c_nationkey IN (1, 2, 3, 4, 5)),
        |avgpos AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM c WHERE bal_cents > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, CAST(count(*) AS BIGINT) AS numcust,
        | floor(CAST(sum(bal_cents) AS DOUBLE) / 100 * 100 + 0.5) / 100 AS totacctbal
        |FROM c, avgpos
        |WHERE bal_cents * n > s
        | AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                 AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // `bal > avg(bal)` is evaluated as `bal_cents * n > sum_cents` —
      // the exact integer cross-multiplication (no IEEE division in the
      // predicate at all). NOT EXISTS → left_anti on the orders key.
      val c = Tables(s, d, "customer")
        .filter(col("c_nationkey").isin(1, 2, 3, 4, 5))
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
      val avgpos = c.filter(col("bal_cents") > 0)
        .agg(sum("bal_cents").as("s_cents"), count(lit(1)).as("n"))
      c.crossJoin(broadcast(avgpos))
        .filter(col("bal_cents") * col("n") > col("s_cents"))
        .join(Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("numcust"),
          round(sum("bal_cents").cast("double") / 100, 2).as("totacctbal"))
        .orderBy("nationkey")
    }
  )
}
