package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** Inventory extensions beyond the core §2 families: exact percentiles,
  * pivot, conditional scalar functions, cross join, multiset set-ops,
  * TF-IDF scoring, and seeded sampling.
  *
  * Scale notes: exact percentile sorts within each group (fine for
  * bounded groups; at 100 TB unbounded-group quantiles switch to
  * approx_percentile's mergeable sketch). Pivot with an explicit value
  * list compiles to one hash aggregate — never use inferred pivot values
  * at scale (extra pass). Seeded Bernoulli sampling is a scan-local
  * filter — no shuffle, fully deterministic per (seed, partition).
  */
object Extras {

  val all: Seq[Q] = Seq(

    Q("q_agg_11_percentile",
      """SELECT l_returnflag,
        | floor((quantile_cont(l_extendedprice, 0.25)) * 10000 + 0.5) / 10000 AS p25,
        | floor((quantile_cont(l_extendedprice, 0.50)) * 10000 + 0.5) / 10000 AS p50,
        | floor((quantile_cont(l_extendedprice, 0.75)) * 10000 + 0.5) / 10000 AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Exact linear-interpolated percentiles (Spark `percentile` ==
      // DuckDB `quantile_cont`).
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.50)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"))
        .orderBy("l_returnflag")
    },

    Q("q_agg_12_pivot",
      """SELECT l_returnflag,
        | floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100 + 0.5) / 100 AS f_qty,
        | floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100 + 0.5) / 100 AS o_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Pivot with an EXPLICIT value list (no extra distinct-values pass).
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .withColumnRenamed("F", "f_qty")
        .withColumnRenamed("O", "o_qty")
        .orderBy("l_returnflag")
    },

    Q("q_agg_13_unpivot",
      """SELECT l_orderkey, l_linenumber, measure, floor((value) * 100 + 0.5) / 100 AS value
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount FROM lineitem WHERE l_orderkey < 100)
        |UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount))
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin) { (s, d) =>
      // Wide→long reshape via Dataset.unpivot (melt), bounded.
      Tables(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          variableColumnName = "measure",
          valueColumnName = "raw_value")
        .select(col("l_orderkey"), col("l_linenumber"), col("measure"),
          round(col("raw_value"), 2).as("value"))
        .orderBy("l_orderkey", "l_linenumber", "measure", "value")
    },

    Q("q_proj_6_conditional",
      """SELECT o_orderkey,
        | nullif(o_orderstatus, 'O') AS closed_status,
        | ifnull(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        | coalesce(nullif(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified') AS pri,
        | CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS size_class
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("closed_status"),
        ifnull(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
        coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")), lit("unspecified")).as("pri"),
        when(col("o_totalprice") > 300000, "big").otherwise("small").as("size_class"))
        .orderBy("o_orderkey")
    },

    Q("q_proj_7_bitwise",
      """SELECT p_partkey,
        | p_size & 12 AS b_and, p_size | 5 AS b_or, xor(p_size, 255) AS b_xor,
        | CAST(p_size AS BIGINT) << 3 AS b_shl, CAST(p_size AS BIGINT) >> 1 AS b_shr
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // Bitwise operator surface (flag masks, hash mixing) — exact
      // integer semantics, identical on both engines.
      Tables(s, d, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey"),
          col("p_size").bitwiseAND(12).as("b_and"),
          col("p_size").bitwiseOR(5).as("b_or"),
          col("p_size").bitwiseXOR(255).as("b_xor"),
          shiftleft(col("p_size").cast("long"), 3).as("b_shl"),
          shiftright(col("p_size").cast("long"), 1).as("b_shr"))
        .orderBy("p_partkey")
    },

    Q("q_join_11_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      // Explicit (bounded) cartesian product — dim × dim only; a cross
      // join with a fact side is forbidden at scale.
      Tables(s, d, "region").crossJoin(Tables(s, d, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    },

    Q("q_set_4_intersect_all",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersectAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    },

    Q("q_set_5_except_all",
      """SELECT o_custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables(s, d, "orders")
      o.select("o_custkey")
        .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
        .orderBy("o_custkey")
    },

    Q("q_text_8_tfidf",
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, token, score, CAST(rn AS BIGINT) AS rn FROM (
        | SELECT tf.doc_id, tf.token,
        |  floor((tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))) * 10000 + 0.5) / 10000 AS score,
        |  row_number() OVER (PARTITION BY tf.doc_id
        |   ORDER BY tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) DESC, tf.token ASC) AS rn
        | FROM tf JOIN df ON tf.token = df.token, n
        | WHERE tf.doc_id < 20)
        |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin) { (s, d) =>
      // TF-IDF top-5 terms per document: tf per (doc, token) joined to a
      // broadcast document-frequency table. At corpus scale df is tiny
      // (vocab-sized) → broadcast; tf never leaves its doc partition.
      val docs = Tables(s, d, "documents")
      // corpus size stays a lazy 1-row broadcast (an eager .count() here
      // would launch a scan job at plan-construction time)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf.filter(col("doc_id") < 20)
        .join(broadcast(dfreq), "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("raw_score", col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
      val w = Window.partitionBy("doc_id").orderBy(col("raw_score").desc, col("token").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("token"), round(col("raw_score"), 4).as("score"),
          col("rn").cast("long").as("rn"))
        .orderBy("doc_id", "rn")
    },

    // Seeded Bernoulli sampling: deterministic for a fixed (seed, data,
    // partitioning) but engine-specific RNG → no oracle; unit tests bound
    // the fraction and assert repeatability.
    Q.noOracle("q_scan_6_sample") { (s, d) =>
      Tables(s, d, "lineitem")
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Q.noOracle("q_scan_7_stratified") { (s, d) =>
      // Stratified sampling: per-language fractions (en down-sampled, the
      // rebalancing move a multilingual training-data pipeline makes).
      val fractions = Map("en" -> 0.1, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.5)
      Tables(s, d, "documents")
        .stat.sampleBy("lang", fractions, 42L)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    }
  )
}
