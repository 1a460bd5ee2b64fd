package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11am): decomposition-based anomaly
  * detection, the multiline-JSON format surface, and one-pass
  * multi-column distinct aggregation.
  *
  * Determinism discipline (§2.12): the anomaly threshold is an exact
  * integer median/MAD comparison on the ×7-scaled detrended grid; the
  * JSON roundtrip re-aggregates to source-provable values; distinct
  * counts are exact integers.
  */
object Round5adOps {

  val all: Seq[Q] = Seq(

    // Decomposition-residual anomalies: days whose trend+seasonal
    // RESIDUAL leaves the 2×MAD robust band — the anomaly screen
    // that raw-value z-scores get wrong on trending/seasonal series
    // (a normal Friday looks anomalous against a flat mean; q_time_16
    // splits the variance, this flags the leftovers).
    Q("q_time_19_stl_anomaly",
      """WITH day AS (SELECT epoch_us(ts) // 86400000000 AS dday,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |tr AS (SELECT dday, y,
        |  CAST(sum(y) OVER win AS BIGINT) AS ts7, CAST(count(*) OVER win AS BIGINT) AS k7,
        |  dday % 7 AS wd
        | FROM day WINDOW win AS (ORDER BY dday ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT dday, y, wd, CAST(7 * y - ts7 AS BIGINT) AS d7 FROM tr WHERE k7 = 7),
        |sea AS (SELECT wd, CAST(floor(CAST(sum(d7) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS s7 FROM f GROUP BY 1),
        |res AS (SELECT f.dday, f.y, f.d7 - sea.s7 AS r7 FROM f JOIN sea ON f.wd = sea.wd),
        |med AS (SELECT CAST(r7 AS BIGINT) AS r7,
        |  row_number() OVER (ORDER BY r7, dday) AS rn, count(*) OVER () AS n FROM res),
        |m AS (SELECT r7 AS med7 FROM med WHERE rn = (n + 1) // 2),
        |madr AS (SELECT abs(res.r7 - m.med7) AS a7,
        |  row_number() OVER (ORDER BY abs(res.r7 - m.med7), res.dday) AS rn, count(*) OVER () AS n
        | FROM res, m),
        |mad AS (SELECT a7 AS mad7 FROM madr WHERE rn = (n + 1) // 2)
        |SELECT CAST(res.dday AS BIGINT) AS day,
        | floor(CAST(res.y AS DOUBLE) / 100 * 100 + 0.5) / 100 AS daily_value,
        | floor(CAST(res.r7 AS DOUBLE) / 7 / 100 * 100 + 0.5) / 100 AS residual,
        | CAST(CASE WHEN res.r7 - m.med7 > 0 THEN 1 ELSE -1 END AS BIGINT) AS side
        |FROM res, m, mad WHERE abs(res.r7 - m.med7) > 2 * mad.mad7
        |ORDER BY day""".stripMargin) { (s, d) =>
      // The residual grid stays on exact ×7-scaled integers end to end
      // (trend via 7y − Σwin, weekday index rounded to the same grid);
      // median and MAD are exact order-statistic picks, and the 2·MAD
      // flag is a pure integer comparison (2·MAD ≈ 1.35σ — the robust
      // band stays populated at every fixture SF, where 3·MAD is empty
      // below sf0.1).
      val win = Window.orderBy("dday").rowsBetween(-3, 3)
      val day = Tables(s, d, "events").filter(col("event_type") === "purchase")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("dday"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
      val f = day
        .select(col("dday"), col("y"), sum("y").over(win).as("ts7"),
          count(lit(1)).over(win).as("k7"), (col("dday") % 7).as("wd"))
        .filter(col("k7") === 7)
        .select(col("dday"), col("y"), col("wd"), (lit(7) * col("y") - col("ts7")).as("d7"))
        .localCheckpoint()
      val sea = f.groupBy(col("wd").as("sw"))
        .agg(floor(sum("d7").cast("double") / count(lit(1)) + 0.5).cast("long").as("s7"))
      val res = f.join(broadcast(sea), col("wd") === col("sw"))
        .select(col("dday"), col("y"), (col("d7") - col("s7")).as("r7"))
        .localCheckpoint()
      def medianOf(df: org.apache.spark.sql.DataFrame, c: String) = {
        val w = Window.orderBy(col(c), col("dday"))
        df.withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
          .filter(col("rn") === floor((col("n") + 1) / lit(2.0)).cast("long"))
          .select(col(c).as("pick"))
      }
      val m = medianOf(res.select(col("dday"), col("r7")), "r7")
      val withMed = res.crossJoin(broadcast(m.withColumnRenamed("pick", "med7")))
      val mad = medianOf(withMed.select(col("dday"), abs(col("r7") - col("med7")).as("a7")), "a7")
        .withColumnRenamed("pick", "mad7")
      withMed.crossJoin(broadcast(mad))
        .filter(abs(col("r7") - col("med7")) > lit(2) * col("mad7"))
        .select(col("dday").cast("long").as("day"),
          (floor(col("y").cast("double") / 100 * 100 + 0.5) / 100).as("daily_value"),
          (floor(col("r7").cast("double") / 7 / 100 * 100 + 0.5) / 100).as("residual"),
          when(col("r7") - col("med7") > 0, 1L).otherwise(-1L).as("side"))
        .orderBy("day")
    },

    // Multiline (pretty-printed) JSON roundtrip: one JSON object per
    // FILE with nested structure — the config/API-dump format that
    // line-delimited readers (q_scan_4) silently mangle; requires the
    // multiLine parser mode.
    Q("q_scan_20_json_multiline",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(r_regionkey) AS BIGINT) AS key_sum,
        | CAST(sum(len(r_name)) AS BIGINT) AS name_chars
        |FROM region""".stripMargin) { (s, d) =>
      // Render the region table as ONE pretty-printed JSON array (a
      // 5-row dimension: the driver-side render is bounded by the
      // catalog, not the fact data), then read with multiLine=true and
      // re-aggregate to values provable from the source (q_scan_3's
      // contract).
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_mljson_${s.sparkContext.applicationId}"
      val rows = Tables(s, d, "region")
        .select(col("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey").collect()
      // JSON-escape the name: quotes/backslashes/control chars would
      // otherwise corrupt the rendered file (fixture-safe today, but
      // the render must not depend on the dimension staying clean)
      def esc(v: String): String = v.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val pretty = rows.map(r =>
        s"""  {\n    "r_regionkey": ${r.get(0)},\n    "r_name": "${esc(r.getString(1))}"\n  }""")
        .mkString("[\n", ",\n", "\n]")
      val dir = new java.io.File(tmp + "_pretty")
      dir.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir.getPath, "data.json"), pretty)
      val out = s.read.option("multiLine", "true").json(dir.getPath)
        .agg(count(lit(1)).as("n_rows"),
          sum("r_regionkey").as("key_sum"),
          sum(length(col("r_name"))).as("name_chars"))
      // the read is fully materialized by agg-time; eagerly compute so
      // the temp dir can be deleted before returning
      val collected = out.localCheckpoint()
      new java.io.File(dir, "data.json").delete()
      dir.delete()
      collected
    },

    // One-pass multi-column distinct aggregation: four distinct counts
    // + a plain count from ONE lineitem scan — the Expand-operator
    // shape (naive code runs four scans; Spark rewrites the
    // multi-distinct into one Expand + two aggregates).
    Q("q_agg_41_multi_distinct",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
        | CAST(count(DISTINCT year(l_shipdate) * 100 + month(l_shipdate)) AS BIGINT) AS n_ship_months
        |FROM lineitem""".stripMargin) { (s, d) =>
      // Four DISTINCT targets in one agg: Catalyst plans ONE Expand
      // (×4 row multiplication tagged by gid) + partial/final
      // aggregates — one fact scan, map-side combinable, vs four
      // separate scans in the naive form.
      Tables(s, d, "lineitem")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .as("n_ship_months"))
    }
  )
}
