package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11ai): final coverage odds-and-ends
  * — delimiter/quote CSV options, grouped top-k materialization, exact
  * duplicate-row detection, and tie-semantics rank diagnostics.
  *
  * Determinism discipline (§2.12): roundtrips re-aggregate to values
  * provable from the source tables; top-k arrays render as joined
  * strings (array columns are representation-fragile across the two
  * engines' pandas paths — §2.12's standing rule); ranks order on exact
  * integers with id tie-breaks where uniqueness is needed.
  */
object Round5zOps {

  val all: Seq[Q] = Seq(

    // CSV with non-default delimiter + quoting: a pipe-delimited file
    // whose payload column CONTAINS the delimiter — the quote/escape
    // path that default-comma roundtrips (q_scan_3) never exercise.
    Q("q_scan_19_csv_options",
      """WITH src AS (SELECT n_nationkey, n_name || '|' || CAST(n_regionkey AS VARCHAR) AS payload
        | FROM nation)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        | CAST(sum(len(payload)) AS BIGINT) AS payload_chars,
        | CAST(sum(CASE WHEN payload LIKE '%|%' THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_delim
        |FROM src""".stripMargin) { (s, d) =>
      // The payload embeds '|' (the delimiter), so the writer MUST
      // quote and the reader MUST unquote — the checks then prove the
      // roundtrip preserved every character: row count, key sum, total
      // payload length, and that every row still contains the
      // delimiter post-roundtrip.
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_csvopt_${s.sparkContext.applicationId}"
      val src = Tables(s, d, "nation")
        .select(col("n_nationkey"),
          concat(col("n_name"), lit("|"), col("n_regionkey").cast("string")).as("payload"))
      src.write.mode("overwrite")
        .option("header", "true").option("delimiter", "|").option("quote", "\"")
        .csv(tmp)
      s.read.option("header", "true").option("delimiter", "|").option("quote", "\"")
        .option("inferSchema", "false").csv(tmp)
        .select(col("n_nationkey").cast("long"), col("payload"))
        .agg(count(lit(1)).as("n_rows"), sum("n_nationkey").as("key_sum"),
          sum(length(col("payload"))).as("payload_chars"),
          sum(when(col("payload").contains("|"), 1L).otherwise(0L)).as("rows_with_delim"))
    },

    // Grouped top-k materialization: the 3 biggest orders per priority
    // as ONE row per group with a joined string — the "give me examples
    // per segment" shape (q_sort_3 returns top-k as rows; downstream
    // report tools want them packed per group).
    Q("q_agg_39_group_topk",
      """WITH r AS (SELECT o_orderpriority, o_orderkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rn
        | FROM orders)
        |SELECT o_orderpriority,
        | string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_orderkeys,
        | floor(CAST(sum(cents) AS DOUBLE) / 100 * 100 + 0.5) / 100 AS top_revenue
        |FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Per-group row_number on exact cents (orderkey tie-break), then
      // the k survivors pack into a deterministic comma string via
      // in-group ORDER BY rn — a string, not an array, per the §2.12
      // representation rule.
      val r = Tables(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_orderpriority").orderBy(col("cents").desc, col("o_orderkey"))))
        .filter(col("rn") <= 3)
      r.groupBy("o_orderpriority")
        .agg(array_join(transform(array_sort(collect_list(struct(col("rn"), col("o_orderkey")))),
            x => x.getField("o_orderkey").cast("string")), ",").as("top_orderkeys"),
          (floor(sum("cents").cast("double") / 100 * 100 + 0.5) / 100).as("top_revenue"))
        .orderBy("o_orderpriority")
    },

    // Exact duplicate-ROW detection over the full lineitem width — the
    // accidental-double-ingestion check (key-level dedup misses rows
    // that differ only by being loaded twice).
    Q("q_dq_31_dup_rows",
      """WITH g AS (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate,
        |  CAST(count(*) AS BIGINT) AS c
        | FROM lineitem GROUP BY ALL)
        |SELECT CAST(count(*) AS BIGINT) AS n_distinct_rows,
        | CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
        | CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_rows_in_dups,
        | CAST(max(c) AS BIGINT) AS worst_multiplicity
        |FROM g""".stripMargin) { (s, d) =>
      // GROUP BY the full row: at scale this shuffles a 16-byte hash of
      // the row (Spark's hash partitioning on all columns), never the
      // row twice; the summary is aggregate-sized.
      val li = Tables(s, d, "lineitem")
      val g = li.groupBy(li.columns.map(col): _*).agg(count(lit(1)).as("c"))
      g.agg(count(lit(1)).as("n_distinct_rows"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_rows_in_dups"),
        max("c").as("worst_multiplicity"))
    },

    // Tie-semantics diagnostics: where rank / dense_rank / row_number
    // disagree on tied order values — the semantics every windowed
    // top-k silently chooses between (row_number splits ties
    // arbitrarily without an id tie-break; rank leaves gaps).
    Q("q_win_24_tie_ranks",
      """WITH r AS (SELECT o_orderpriority,
        |  CAST(floor(o_totalprice) AS BIGINT) // 1000 AS bucket,
        |  rank() OVER w AS rk, dense_rank() OVER w AS drk
        | FROM orders
        | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY CAST(floor(o_totalprice) AS BIGINT) // 1000))
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(max(rk) AS BIGINT) AS max_rank, CAST(max(drk) AS BIGINT) AS n_distinct_buckets,
        | CAST(sum(CASE WHEN rk <> drk THEN 1 ELSE 0 END) AS BIGINT) AS n_gapped
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Ranks run on the COARSE bucket (floor/1000) so ties are
      // plentiful — which makes the tie semantics derivable from the
      // per-(priority, bucket) COUNT table alone (r13, replacing two
      // 5-task full-fact window sorts with a keyed aggregate + a
      // range-partitioned per-priority prefix sum over the bucket
      // table): every row of bucket i shares rank() = cum_i − cnt_i + 1
      // and dense_rank() = i (Pipelines.groupRankPrefix's rank over the
      // distinct buckets), so max(rank), max(dense_rank), and the
      // gapped-row count are exact integer folds over the bucket table
      // — identical values, aggregated so no per-row arbitrary-tie
      // output leaks into the hash.
      val bucket = (floor(col("o_totalprice")).cast("long") / 1000).cast("long")
      val b = Tables(s, d, "orders")
        .select(col("o_orderpriority"), bucket.as("bucket"))
        .groupBy("o_orderpriority", "bucket").agg(count(lit(1)).as("cnt"))
      val r = graft.api.Pipelines.groupRankPrefix(b, Seq("o_orderpriority"),
          Seq(col("bucket")), "drk", "__nb", Seq(("cnt", "cum", "")))
        .select(col("o_orderpriority"), col("cnt"), col("drk"),
          (col("cum") - col("cnt") + 1).as("rk"))
      r.groupBy("o_orderpriority")
        .agg(sum("cnt").as("n"),
          max("rk").cast("long").as("max_rank"),
          max("drk").cast("long").as("n_distinct_buckets"),
          sum(when(col("rk") =!= col("drk"), col("cnt")).otherwise(0L)).as("n_gapped"))
        .orderBy("o_orderpriority")
    }
  )
}
