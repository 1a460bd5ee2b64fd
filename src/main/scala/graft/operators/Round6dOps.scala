package graft.operators

import graft.Q
import graft.functions.Num
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 continuation (SURVEY §2.11at): thin-family depth — array
  * HOF statistics, map-typed aggregation, a NESTED JSON round-trip,
  * predicate selectivity profiling, and a catalog-wide PK audit.
  *
  * Determinism discipline (§2.12): array/map contents build from
  * sorted exact integers; every ratio quantizes at emission; the JSON
  * round-trip is proven by hash-matching the direct relational
  * computation of the same aggregate.
  */
object Round6dOps {

  val all: Seq[Q] = Seq(

    // Array-kernel statistics per embedding vector: length, min, max,
    // mean and positive-component count computed ENTIRELY with array
    // higher-order functions — no explode, no shuffle, one codegen'd
    // projection per row (the explode version shuffles |dim|× the
    // rows; at 100 TB that is the difference between a map-only stage
    // and a corpus-sized exchange).
    Q("q_arr_4_vector_stats",
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        | floor(CAST(list_min(embedding) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS v_min,
        | floor(CAST(list_max(embedding) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS v_max,
        | floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, x) -> a + x)
        |   / len(embedding) * 1000000 + 0.5) / 1000000 AS v_mean,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin) { (s, d) =>
      // aggregate() folds the double-cast components in ARRAY ORDER on
      // both engines (same summation order -> same IEEE result, the
      // Duck.dot precedent); min/max/filter are order-free. Bounded to
      // 100 rows for the declared table; the per-row kernel itself is
      // corpus-scale.
      Tables(s, d, "embeddings")
        .filter(col("vec_id") < 100)
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          Num.round(array_min(col("embedding")).cast("double"), 6).as("v_min"),
          Num.round(array_max(col("embedding")).cast("double"), 6).as("v_max"),
          Num.round(aggregate(col("embedding"), lit(0.0), (a, x) => a + x.cast("double"))
            / size(col("embedding")), 6).as("v_mean"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_positive"))
        .orderBy("vec_id")
    },

    // Map-typed aggregation: per-source language histogram built AS A
    // MAP (map_from_entries over sorted collect), thinned with
    // map_filter (languages with 2+ docs), then exploded back to rows
    // — the map-column lifecycle (build → transform → explode) that
    // catalog-style per-entity attribute bags need.
    Q("q_map_3_lang_map",
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY source, lang""".stripMargin) { (s, d) =>
      // The oracle is the relational equivalent (GROUP BY + HAVING);
      // the Spark side proves the map path reproduces it exactly. The
      // map builds from entries SORTED by key (collect_list order is
      // partition-dependent — array_sort before map_from_entries is
      // the §2.12 determinism rule for constructed collections).
      val counts = Tables(s, d, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      val maps = counts.groupBy("source")
        .agg(map_from_entries(array_sort(collect_list(struct(col("lang"), col("n")))))
          .as("lang_map"))
      maps.select(col("source"),
          explode(map_filter(col("lang_map"), (_, v) => v >= 2)).as(Seq("lang", "n_docs")))
        .orderBy("source", "lang")
    },

    // NESTED JSON round-trip: each user's last three purchases packed
    // into one JSON document (struct + array-of-structs), re-parsed
    // with an explicit nested schema, re-exploded and re-aggregated —
    // proven by hash-matching the direct relational aggregate. The
    // event-log-to-API-payload-and-back cycle q_json_3's flat
    // round-trip doesn't cover.
    Q("q_json_6_nested_roundtrip",
      """WITH r AS (SELECT user_id, event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events WHERE event_type = 'purchase')
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_recent,
        | CAST(sum(cents) AS BIGINT) AS recent_cents
        |FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val recent = Tables(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
      // pack: one JSON doc per user, events array sorted by rank
      val packed = recent.groupBy("user_id")
        .agg(to_json(struct(col("user_id"),
          transform(array_sort(collect_list(struct(col("rn"), col("cents")))),
            x => x.getField("cents")).as("cents"))).as("doc"))
      // unpack with the explicit nested schema and re-aggregate
      val schema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("cents", ArrayType(LongType))))
      packed.select(from_json(col("doc"), schema).as("j"))
        .select(col("j.user_id").as("user_id"), explode(col("j.cents")).as("cents"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_recent"), sum("cents").as("recent_cents"))
        .orderBy("user_id")
    },

    // Predicate selectivity ladder: survivors of four NESTED predicates
    // counted in ONE scan (conditional sums) — the cardinality-
    // estimation ground truth a cost-based optimizer wants, and the
    // demonstration that profiling all filter stages costs one pass,
    // not four (at 100 TB, four scans vs one is the whole game).
    Q("q_filter_4_selectivity",
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        | CAST(sum(CASE WHEN l_shipdate >= DATE '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_p1,
        | CAST(sum(CASE WHEN l_shipdate >= DATE '1996-01-01' AND l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_p2,
        | CAST(sum(CASE WHEN l_shipdate >= DATE '1996-01-01' AND l_discount > 0.05 AND l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_p3,
        | CAST(sum(CASE WHEN l_shipdate >= DATE '1996-01-01' AND l_discount > 0.05 AND l_quantity >= 25 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_p4,
        | floor(CAST(sum(CASE WHEN l_shipdate >= DATE '1996-01-01' AND l_discount > 0.05 AND l_quantity >= 25 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS sel_p4
        |FROM lineitem""".stripMargin) { (s, d) =>
      val p1 = col("l_shipdate") >= lit("1996-01-01").cast("date")
      val p2 = p1 && col("l_discount") > 0.05
      val p3 = p2 && col("l_quantity") >= 25
      val p4 = p3 && col("l_returnflag") === "R"
      def cnt(p: org.apache.spark.sql.Column) = sum(when(p, 1L).otherwise(0L))
      Tables(s, d, "lineitem")
        .agg(count(lit(1)).as("n_total"),
          cnt(p1).as("n_p1"), cnt(p2).as("n_p2"), cnt(p3).as("n_p3"), cnt(p4).as("n_p4"),
          Num.round(cnt(p4).cast("double") / count(lit(1)), 6).as("sel_p4"))
    },

    // Catalog-wide primary-key audit: rows vs distinct-PK for five
    // tables in ONE result — the uniqueness contract every warehouse
    // load asserts before joins are trusted (q_dq_2 checks FOREIGN
    // keys point somewhere; this checks the PRIMARY side is a key at
    // all). lineitem's composite (orderkey, linenumber) genuinely
    // fails in the fixtures, so the audit is not a tautology.
    Q("q_dq_34_pk_audit",
      """SELECT * FROM (
        | SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys FROM customer
        | UNION ALL SELECT 'lineitem', count(*),
        |  count(DISTINCT l_orderkey * 100 + l_linenumber) FROM lineitem
        | UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
        | UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
        | UNION ALL SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier)
        |ORDER BY tbl""".stripMargin) { (s, d) =>
      // Five independent aggregates unioned — each is one map-side
      // distinct pass on its own table; nothing joins. The lineitem
      // composite packs into one BIGINT (linenumber < 100) so the
      // distinct is single-column on both engines.
      def audit(name: String, key: org.apache.spark.sql.Column) =
        Tables(s, d, name).agg(count(lit(1)).as("n_rows"),
            countDistinct(key).as("n_keys"))
          .select(lit(name).as("tbl"), col("n_rows"), col("n_keys"))
      audit("customer", col("c_custkey"))
        .union(audit("lineitem", col("l_orderkey") * 100 + col("l_linenumber")))
        .union(audit("orders", col("o_orderkey")))
        .union(audit("part", col("p_partkey")))
        .union(audit("supplier", col("s_suppkey")))
        .orderBy("tbl")
    }
  )
}
