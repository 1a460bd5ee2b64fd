package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 continuation (SURVEY §2.11bq): ETL-surface wave — URL
  * parsing, epoch round trips, an executable schema contract, the
  * last_value default-frame pitfall, and base64 blob transport.
  *
  * Determinism discipline (§2.12): URL/epoch/base64 queries compare
  * VALUES the construction must invert (never engine-private
  * representations); the schema contract pins FIXTURES.md as a failing
  * check instead of documentation.
  */
object Round7qOps {

  val all: Seq[Q] = Seq(

    // URL parsing: construct canonical URLs from dimension columns,
    // then take them apart with parse_url (HOST / PATH / one QUERY
    // param). DuckDB has no parse_url, so the oracle re-derives the
    // parts from the SAME source columns — parsing must exactly invert
    // construction or the hash flips.
    Q("q_proj_11_url_parse",
      """SELECT c_custkey,
        | lower(c_mktsegment) || '.example.com' AS host,
        | '/u/' || CAST(c_custkey AS VARCHAR) AS path,
        | CAST(c_nationkey AS VARCHAR) AS q_param,
        | '2' AS p_param
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val url = concat(lit("https://"), lower(col("c_mktsegment")),
        lit(".example.com/u/"), col("c_custkey").cast("string"),
        lit("?q="), col("c_nationkey").cast("string"), lit("&p=2"))
      Tables(s, d, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"), url.as("__url"))
        .select(col("c_custkey"),
          parse_url(col("__url"), lit("HOST")).as("host"),
          parse_url(col("__url"), lit("PATH")).as("path"),
          parse_url(col("__url"), lit("QUERY"), lit("q")).as("q_param"),
          parse_url(col("__url"), lit("QUERY"), lit("p")).as("p_param"))
        .orderBy("c_custkey")
    },

    // Epoch round trips under the UTC session: timestamp → epoch
    // seconds/millis → formatted string and back-comparison — the
    // conversion chain every log pipeline crosses at least twice.
    Q("q_time_25_unix_roundtrip",
      """SELECT o_orderkey,
        | CAST(epoch(o_orderdate) AS BIGINT) AS es,
        | CAST(epoch_ms(o_orderdate) AS BIGINT) AS ems,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS rt,
        | CAST(CASE WHEN epoch_ms(o_orderdate) = epoch(o_orderdate) * 1000
        |   THEN 1 ELSE 0 END AS BIGINT) AS whole_seconds
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // NTZ fixture timestamps cast to TIMESTAMP under the UTC session
      // (value-preserving), so unix_timestamp/unix_millis agree with
      // DuckDB's epoch()/epoch_ms() bit for bit.
      val ts = col("o_orderdate").cast("timestamp")
      Tables(s, d, "orders")
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          unix_timestamp(ts).as("es"),
          unix_millis(ts).as("ems"),
          date_format(ts, "yyyy-MM-dd HH:mm:ss").as("rt"),
          (unix_millis(ts) === unix_timestamp(ts) * 1000).cast("long")
            .as("whole_seconds"))
        .orderBy("o_orderkey")
    },

    // The FIXTURES.md orders schema as an EXECUTABLE contract: the
    // observed (position, name, Catalyst type) rows join against the
    // declared expectation, each row carrying a match flag — schema
    // drift in a fixture regeneration fails the oracle gate instead of
    // silently shifting downstream query semantics.
    Q("q_dq_36_schema_contract",
      """SELECT * FROM (VALUES
        | (CAST(1 AS BIGINT), 'o_orderkey',      'LongType',         CAST(1 AS BIGINT)),
        | (CAST(2 AS BIGINT), 'o_custkey',       'LongType',         CAST(1 AS BIGINT)),
        | (CAST(3 AS BIGINT), 'o_orderstatus',   'StringType',       CAST(1 AS BIGINT)),
        | (CAST(4 AS BIGINT), 'o_totalprice',    'DoubleType',       CAST(1 AS BIGINT)),
        | (CAST(5 AS BIGINT), 'o_orderdate',     'TimestampNTZType', CAST(1 AS BIGINT)),
        | (CAST(6 AS BIGINT), 'o_orderpriority', 'StringType',       CAST(1 AS BIGINT))
        |) AS t(pos, col_name, col_type, matches)
        |ORDER BY pos""".stripMargin) { (s, d) =>
      // Schema introspection is plan metadata (no data read); the tiny
      // driver-side list is the contract itself, not a collect of rows.
      val expected = Seq(
        (1L, "o_orderkey", "LongType"), (2L, "o_custkey", "LongType"),
        (3L, "o_orderstatus", "StringType"), (4L, "o_totalprice", "DoubleType"),
        (5L, "o_orderdate", "TimestampNTZType"), (6L, "o_orderpriority", "StringType"))
      val observed = Tables(s, d, "orders").schema.fields.zipWithIndex
        .map { case (f, i) => ((i + 1).toLong, f.name, f.dataType.toString) }.toSeq
      import s.implicits._
      val obs = observed.toDF("pos", "col_name", "col_type")
      val exp = expected.toDF("e_pos", "e_name", "e_type")
      obs.join(exp, col("pos") === col("e_pos"), "full")
        .select(coalesce(col("pos"), col("e_pos")).as("pos"),
          coalesce(col("col_name"), col("e_name")).as("col_name"),
          coalesce(col("col_type"), col("e_type")).as("col_type"),
          (col("col_name") <=> col("e_name") && col("col_type") <=> col("e_type"))
            .cast("long").as("matches"))
        .orderBy("pos")
    },

    // The last_value default-frame pitfall, pinned: with the default
    // frame (UNBOUNDED PRECEDING .. CURRENT ROW) last_value is just the
    // CURRENT row — the classic silent bug — while the explicit
    // full-partition frame returns the true last. Both engines run the
    // IDENTICAL window SQL semantics here.
    Q("q_win_32_frame_pitfall",
      """WITH t AS (SELECT o_orderpriority AS pr,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS t2, o_orderkey
        | FROM orders),
        |w AS (SELECT pr, t2,
        |  last_value(t2) OVER (PARTITION BY pr ORDER BY o_orderkey) AS lv_default,
        |  last_value(t2) OVER (PARTITION BY pr ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv_full
        | FROM t)
        |SELECT pr AS o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN lv_default = t2 THEN 1 ELSE 0 END) AS BIGINT) AS n_default_is_current,
        | CAST(min(lv_full) AS DOUBLE) / 100 AS last_by_key,
        | CAST(CASE WHEN min(lv_full) = max(lv_full) THEN 1 ELSE 0 END AS BIGINT) AS full_frame_constant
        |FROM w GROUP BY pr ORDER BY pr""".stripMargin) { (s, d) =>
      val byKey = Window.partitionBy(col("pr")).orderBy(col("o_orderkey"))
      val full = byKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "orders")
        .select(col("o_orderpriority").as("pr"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("t2"), col("o_orderkey"))
        .select(col("pr"), col("t2"),
          last(col("t2")).over(byKey).as("lv_default"),
          last(col("t2")).over(full).as("lv_full"))
        .groupBy("pr")
        .agg(count(lit(1)).as("n"),
          sum(when(col("lv_default") === col("t2"), 1L).otherwise(0L))
            .as("n_default_is_current"),
          (min(col("lv_full")).cast("double") / 100).as("last_by_key"),
          (min(col("lv_full")) === max(col("lv_full"))).cast("long")
            .as("full_frame_constant"))
        .select(col("pr").as("o_orderpriority"), col("n"),
          col("n_default_is_current"), col("last_by_key"), col("full_frame_constant"))
        .orderBy("o_orderpriority")
    },

    // Base64 transport of binary payloads: encode → base64 text →
    // decode back, with the round trip value-compared and the encoded
    // length pinned (4·⌈len/3⌉ with padding) — the blob-over-JSON path
    // every multimodal manifest uses.
    Q("q_mm_12_base64_transport",
      """WITH b AS (SELECT doc_id, encode(substring(text, 1, 40)) AS payload
        | FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        | CAST(length(to_base64(payload)) AS BIGINT) AS b64_len,
        | CAST(octet_length(payload) AS BIGINT) AS raw_len,
        | CAST(CASE WHEN from_base64(to_base64(payload)) = payload
        |   THEN 1 ELSE 0 END AS BIGINT) AS roundtrip_ok
        |FROM b ORDER BY doc_id""".stripMargin) { (s, d) =>
      val payload = encode(substring(col("text"), 1, 40), "UTF-8")
      Tables(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"),
          length(base64(col("payload"))).cast("long").as("b64_len"),
          length(col("payload")).cast("long").as("raw_len"),
          (unbase64(base64(col("payload"))) === col("payload")).cast("long")
            .as("roundtrip_ok"))
        .orderBy("doc_id")
    }
  )
}
