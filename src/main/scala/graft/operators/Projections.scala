package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** §2.2 — projection, filters, predicates, scalar expression library.
  *
  * Scale notes: every filter here is expressed on raw columns so Catalyst
  * pushes it into the Parquet scan (`PushedFilters`), which at 100 TB means
  * row-group skipping via min/max statistics. Scalar expressions are all
  * built-in `functions._` → whole-stage codegen, no UDF boundaries.
  */
object Projections {

  val all: Seq[Q] = Seq(

    Q("q_proj_1_arith",
      """SELECT l_orderkey, l_linenumber,
        | floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS charge,
        | floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS disc_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, charge, disc_price""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("charge"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("disc_price"))
        // ordering over ALL output columns: (okey, line) alone is not
        // unique in the fixtures
        .orderBy("l_orderkey", "l_linenumber", "charge", "disc_price")
    },

    Q("q_filter_1_range",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity BETWEEN 10 AND 20
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
          && col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Q("q_filter_2_compound",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE (l_returnflag = 'R' OR l_linestatus = 'F') AND l_discount > 0.05 AND NOT l_tax = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables(s, d, "lineitem")
        .filter((col("l_returnflag") === "R" || col("l_linestatus") === "F")
          && col("l_discount") > 0.05 && !(col("l_tax") === 0))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Q("q_filter_3_in_null",
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'F' THEN 'done' WHEN o_orderstatus = 'O' THEN 'open' ELSE 'other' END AS status_class
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") && col("o_custkey").isNotNull)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", "done")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_class"))
        .orderBy("o_orderkey")
    },

    Q("q_proj_2_string",
      """SELECT c_custkey, lower(c_name) AS lname, upper(c_mktsegment) AS useg,
        | trim(c_name) AS tname, substring(c_name, 1, 8) AS pref,
        | CAST(length(c_name) AS BIGINT) AS nlen,
        | concat_ws('|', c_mktsegment, c_name) AS joined,
        | replace(c_name, 'Customer', 'Cust') AS repl,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables(s, d, "customer").select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        upper(col("c_mktsegment")).as("useg"),
        trim(col("c_name")).as("tname"),
        substring(col("c_name"), 1, 8).as("pref"),
        length(col("c_name")).cast("long").as("nlen"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"))
        .orderBy("c_custkey")
    },

    Q("q_proj_3_datetime",
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | CAST(day(o_orderdate) AS BIGINT) AS dd,
        | date_trunc('month', o_orderdate) AS mon_start,
        | CAST(date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS BIGINT) AS days_since,
        | strftime((o_orderdate + INTERVAL 3 MONTH)::DATE, '%Y-%m-%d') AS plus3m,
        | strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dd"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        // DATE-typed outputs are serialized differently by the two
        // engines' pandas paths (object date vs datetime64) — emit ISO
        // strings, which are representation-proof.
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
        .orderBy("o_orderkey")
    },

    Q("q_proj_4_math",
      """SELECT p_partkey,
        | floor((abs(p_retailprice - 1000)) * 1000000 + 0.5) / 1000000 AS a,
        | CAST(ceil(p_retailprice) AS BIGINT) AS c,
        | CAST(floor(p_retailprice) AS BIGINT) AS f,
        | floor((sqrt(CAST(p_size AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS sq,
        | floor((pow(CAST(p_size AS DOUBLE), 2)) * 1000000 + 0.5) / 1000000 AS p2,
        | floor((ln(p_retailprice)) * 10000 + 0.5) / 10000 AS lg,
        | floor((exp(CAST(p_size AS DOUBLE) / 25.0)) * 10000 + 0.5) / 10000 AS ex,
        | CAST(sign(p_retailprice - 1000) AS DOUBLE) AS sg,
        | CAST(greatest(p_size, 25) AS BIGINT) AS g,
        | CAST(least(p_size, 25) AS BIGINT) AS l
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // ln/exp are rounded to 4dp (not 6) — libm vs JDK Math can differ in
      // the last ulp; sqrt is IEEE correctly-rounded so 6dp is safe.
      Tables(s, d, "part").select(
        col("p_partkey"),
        round(abs(col("p_retailprice") - 1000), 6).as("a"),
        ceil(col("p_retailprice")).cast("long").as("c"),
        floor(col("p_retailprice")).cast("long").as("f"),
        round(sqrt(col("p_size").cast("double")), 6).as("sq"),
        round(pow(col("p_size").cast("double"), 2), 6).as("p2"),
        round(log(col("p_retailprice")), 4).as("lg"),
        round(exp(col("p_size").cast("double") / 25.0), 4).as("ex"),
        signum(col("p_retailprice") - 1000).cast("double").as("sg"),
        greatest(col("p_size"), lit(25)).cast("long").as("g"),
        least(col("p_size"), lit(25)).cast("long").as("l"))
        .orderBy("p_partkey")
    },

    Q("q_proj_5_regex",
      """SELECT p_partkey,
        | regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"))
        .orderBy("p_partkey")
    }
  )
}
