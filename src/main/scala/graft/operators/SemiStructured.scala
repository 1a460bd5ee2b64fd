package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import graft.functions.Num.round

/** §2.8 — array / map / JSON semi-structured operators.
  *
  * Scale notes: `get_json_object` and `from_json` are per-row codegen'd
  * expressions (no shuffle); at 100 TB the win is parsing ONLY projected
  * keys instead of materializing whole JSON trees. Higher-order functions
  * (`transform`/`aggregate`/`zip_with`) run inside whole-stage codegen —
  * vector math over `ArrayType` columns never leaves the JVM loop.
  * `explode` multiplies rows — always bounded or immediately re-aggregated.
  */
object SemiStructured {

  val all: Seq[Q] = Seq(

    Q("q_json_1_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY k NULLS FIRST""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    },

    Q("q_json_2_schema",
      """SELECT event_type, floor((sum(CAST(json_extract_string(props, '$.k') AS BIGINT))) * 100 + 0.5) / 100 AS sum_k,
        | count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // Schema-full parse: from_json with an explicit struct schema (vs the
      // path-extract above). Both compile to JsonToStructs / GetJsonObject.
      Tables(s, d, "events")
        .withColumn("p", from_json(col("props"), "k LONG", Map.empty[String, String]))
        .groupBy("event_type")
        .agg(round(sum(col("p.k")), 2).as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy("event_type")
    },

    Q("q_arr_1_hof",
      """SELECT vec_id,
        | floor((sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding, x -> CAST(x * x AS DOUBLE))), (a, x) -> a + x))) * 1000000 + 0.5) / 1000000 AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      // L2 norm via HOFs. Both sides: float*float multiply (IEEE-identical),
      // cast to double, then a left fold from 0.0 — bit-identical
      // accumulation order, so round(...,6) is stable.
      Tables(s, d, "embeddings").select(
        col("vec_id"),
        round(sqrt(aggregate(
          transform(col("embedding"), x => (x * x).cast("double")),
          lit(0.0), (acc, x) => acc + x)), 6).as("l2_norm"))
        .orderBy("vec_id")
    },

    Q("q_arr_2_explode",
      """SELECT doc_id, unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
        | unnest(string_split(text, ' ')) AS token
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      // Generator/UDTF surface: posexplode = Spark's built-in Generator.
      Tables(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "token")
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos")
    },

    Q("q_arr_3_construct",
      """SELECT vec_id,
        | CAST(len(embedding) AS BIGINT) AS n_dims,
        | floor((CAST(embedding[1] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS first_val,
        | floor((CAST(embedding[-1] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS last_val,
        | floor((list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))), (a, x) -> a + x)) * 1000000 + 0.5) / 1000000 AS head4_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(element_at(col("embedding"), -1).cast("double"), 6).as("last_val"),
        round(aggregate(transform(slice(col("embedding"), 1, 4), _.cast("double")),
          lit(0.0), (a, x) => a + x), 6).as("head4_sum"))
        .orderBy("vec_id")
    },

    // Map construction/access: no canonical cross-engine map ordering →
    // no oracle; the unit test asserts content. Emitted as sorted entries.
    Q("q_map_1_basic",
      """WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type)
        |SELECT string_agg(event_type, ',' ORDER BY event_type) AS keys_sorted,
        | max(CASE WHEN event_type = 'click' THEN cnt END) AS n_click,
        | CAST(count(*) AS BIGINT) AS n_types FROM c""".stripMargin) { (s, d) =>
      // Map construction + lookup (map_from_entries / map_keys /
      // element_at / size). Map KEY ORDER is engine-private, so the
      // declared output projects order-independent facts (sorted key
      // list, one lookup, cardinality) — which is exactly what lets the
      // oracle verify the VALUES in plain SQL while the Spark side
      // proves the map operators; round-2 kept this row no_oracle, but
      // the sorted projection never needed that concession.
      val counts = Tables(s, d, "events")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      counts.agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(
          concat_ws(",", sort_array(map_keys(col("m")))).as("keys_sorted"),
          element_at(col("m"), "click").as("n_click"),
          size(col("m")).cast("long").as("n_types"))
    },

    Q("q_json_3_roundtrip",
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      // Serde round-trip: struct → JSON string → parsed struct → columns.
      // The oracle is simply the source columns — the query proves
      // to_json/from_json are lossless inverses for this schema.
      val n = Tables(s, d, "nation")
      n.select(to_json(struct(col("n_nationkey"), col("n_name"), col("n_regionkey"))).as("js"))
        .select(from_json(col("js"),
          "n_nationkey INT, n_name STRING, n_regionkey INT",
          Map.empty[String, String]).as("p"))
        .select(col("p.n_nationkey").as("n_nationkey"), col("p.n_name").as("n_name"),
          col("p.n_regionkey").as("n_regionkey"))
        .orderBy("n_nationkey")
    },

    Q("q_map_2_hof",
      """WITH s AS (SELECT event_type, count(*) AS cnt,
        |  sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sc
        | FROM events GROUP BY event_type)
        |SELECT
        | string_agg(event_type || ':' ||
        |   CAST(CAST(floor((CAST(sc AS DOUBLE) / 100) / cnt * 10000 + 0.5) AS BIGINT) AS VARCHAR),
        |   ',' ORDER BY event_type) AS avgs_e4,
        | string_agg(event_type || ':' || CAST(cnt * 2 AS VARCHAR),
        |   ',' ORDER BY event_type) AS doubled,
        | CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_clickview
        |FROM s""".stripMargin) { (s, d) =>
      // Map higher-order functions: transform_values / map_filter /
      // map_zip_with over per-type event stats, projected through sorted
      // entries so map key order (engine-private) never reaches the
      // output. Averages are scaled-integer ten-thousandths computed
      // from exact cents — both the float-sum accumulation order AND
      // double-to-string formatting differences that kept this row
      // no_oracle in round 2 are gone, so the oracle verifies the values
      // while the Spark side proves the map operators.
      val stats = Tables(s, d, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("sc"))
      stats
        .agg(
          map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt"))))).as("counts"),
          map_from_entries(sort_array(collect_list(struct(col("event_type"), col("sc"))))).as("sums"))
        .select(
          map_zip_with(col("counts"), col("sums"),
            (_, c, sc) => floor((sc.cast("double") / 100) / c * 10000 + 0.5).cast("long"))
            .as("avg_by_type"),
          transform_values(col("counts"), (_, v) => v * 2).as("doubled"),
          map_filter(col("counts"), (k, _) => k.isin("click", "view")).as("clickview"))
        .select(
          concat_ws(",", transform(sort_array(map_entries(col("avg_by_type"))),
            e => concat(e.getField("key"), lit(":"), e.getField("value").cast("string")))).as("avgs_e4"),
          concat_ws(",", transform(sort_array(map_entries(col("doubled"))),
            e => concat(e.getField("key"), lit(":"), e.getField("value").cast("string")))).as("doubled"),
          size(col("clickview")).cast("long").as("n_clickview"))
    }
  )
}
