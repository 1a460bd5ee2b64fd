package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 — scans, sources, sinks.
  *
  * Scale notes: Parquet scans get column pruning + predicate pushdown from
  * Catalyst for free as long as filters/selects stay on raw columns; at
  * 100 TB the same code reads a partitioned directory and prunes
  * partitions. CSV/JSON round-trips exercise the connector surface (an
  * ETL engine must speak ≥2 interchange formats); they use explicit
  * schemas — schema inference is a full extra pass over the data and is
  * never acceptable at scale.
  */
object Scans {

  private val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val all: Seq[Q] = Seq(

    Q("q_scan_1_full",
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures (~20% of
      // rows collide); l_extendedprice completes the total order.
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice") { (s, d) =>
      Tables(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    },

    Q("q_scan_2_pruned",
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber") { (s, d) =>
      // Only 3 of 11 columns → ReadSchema in the scan must shrink accordingly.
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Connector round-trips: the oracle does NOT read the temp dir (DuckDB
    // can't see it) — it reads the SOURCE table, which the round-trip must
    // reproduce value-for-value (CSV/JSON with explicit schemas and ORC are
    // lossless for int/string/double at these magnitudes). The hash gate
    // thus proves end-to-end write→read fidelity, not just shape.
    Q("q_scan_3_csv_roundtrip",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, d) =>
      // fixed dir + overwrite: Bench invokes each fn twice (warm + timed)
      // and a fresh createTempDirectory per call would litter /tmp
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_csv_${s.sparkContext.applicationId}"
      Tables(s, d, "region").write.mode("overwrite")
        .option("header", "true").csv(tmp)
      s.read.schema(regionSchema).option("header", "true").csv(tmp)
        .orderBy("r_regionkey")
    },

    Q("q_scan_4_jsonlines",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") { (s, d) =>
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_json_${s.sparkContext.applicationId}"
      Tables(s, d, "nation").write.mode("overwrite").json(tmp)
      s.read.schema(nationSchema).json(tmp).orderBy("n_nationkey")
    },

    Q("q_scan_5_events_ns",
      "SELECT event_id, date_trunc('second', ts::TIMESTAMP) AS ts_s FROM events ORDER BY event_id") { (s, d) =>
      // The ns-timestamp gotcha (G1): Tables() reads ns-as-long and converts
      // with exact integer division; output truncated to seconds so both
      // engines agree below µs.
      Tables(s, d, "events")
        .select(col("event_id"), date_trunc("second", col("ts")).as("ts_s"))
        .orderBy("event_id")
    }
  )
}
