package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Connector/sink surface beyond CSV/JSON (§2.1): ORC round-trip,
  * partitioned parquet layout, and bucketed tables.
  *
  * Scale notes: partitionBy(<low-cardinality col>) gives free partition
  * pruning to every downstream reader — the single most important layout
  * decision at 100 TB (facts partitioned by date, never by high-
  * cardinality keys which would create millions of dirs). Bucketing
  * pre-shuffles a table by join key ONCE at write time so every later
  * join/agg on that key is shuffle-free — declared as
  * `q_join_15_bucketed` via external-path tables (no warehouse needed),
  * with the shuffle-free plan shape pinned in ScaleToolsSpec.
  */
object Sinks {

  val all: Seq[Q] = Seq(

    // Oracle reads the SOURCE table the ORC round-trip must reproduce
    // value-for-value (see q_scan_3's fidelity-gate note).
    Q("q_scan_8_orc_roundtrip",
      "SELECT * FROM supplier ORDER BY s_suppkey") { (s, d) =>
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_orc_${s.sparkContext.applicationId}"
      Tables(s, d, "supplier").write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).orderBy("s_suppkey")
    },

    Q("q_scan_9_schema_merge",
      """SELECT count(*) AS n_rows,
        | count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_with_priority,
        | floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total
        |FROM orders""".stripMargin) { (s, d) =>
      // Schema evolution: two parquet generations (v2 adds a column),
      // read back with mergeSchema — v1 rows surface NULL for the new
      // column. The oracle recomputes the same aggregate straight from
      // the source table, proving the evolved read is lossless. At scale
      // this is the schema-drift story for append-only lakes; merge cost
      // is footer-only.
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_merge_${s.sparkContext.applicationId}"
      val o = Tables(s, d, "orders")
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$tmp/v1")
      o.filter(col("o_orderkey") % 2 =!= 0)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$tmp/v2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderpriority")).as("n_with_priority"),
          round(sum("o_totalprice"), 2).as("total"))
    },

    Q("q_sink_1_partitioned",
      """SELECT o_orderpriority, count(*) AS n, floor((sum(o_totalprice)) * 100 + 0.5) / 100 AS total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // Write orders partitioned by priority, read back through a
      // partition-pruned scan, aggregate per partition value. The oracle
      // sees the same numbers straight from the source table — proving
      // the partitioned layout round-trips losslessly.
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_part_${s.sparkContext.applicationId}"
      Tables(s, d, "orders").write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          graft.functions.Num.round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    },

    Q("q_join_15_bucketed",
      """SELECT o_orderpriority, count(*) AS n_items,
        | CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT) AS price_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // The co-located join: both fact tables bucketed 8-ways on the
      // join key AT WRITE TIME (external-path tables, so no warehouse
      // needed), then the recurring join runs with ZERO shuffle of
      // either side — the single biggest repeated-join win at 100 TB,
      // where re-shuffling a fact table per query is the dominant cost.
      // The write is guarded by catalog existence: it happens once per
      // session (the amortization IS the point — one shuffle at layout
      // time, none at query time). The oracle is the plain join, pinning
      // that bucketing never changes results; ScaleToolsSpec pins the
      // shuffle-free SortMergeJoin plan shape with broadcast disabled.
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_bkt_${s.sparkContext.applicationId}"
      if (!s.catalog.tableExists("graft_orders_bkt")) {
        Tables(s, d, "orders").write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$tmp/orders").saveAsTable("graft_orders_bkt")
        Tables(s, d, "lineitem").write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$tmp/lineitem").saveAsTable("graft_lineitem_bkt")
      }
      s.table("graft_lineitem_bkt")
        .join(s.table("graft_orders_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long").as("price_cents"))
        .orderBy("o_orderpriority")
    }
  )
}
