package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive an sf1-equivalent fixture from the driver's read-only sf0.1
  * parquet by UNION-ALLing each fact table `factor` times with
  * key-offset remapping (VERDICT r7 item 3 — empirical scale
  * rehearsal). Every key domain shifts by i·(max+1) per replica, and
  * FOREIGN keys shift by the SAME offsets, so join fan-outs,
  * selectivities, and per-key cardinalities match the original —
  * replica i is a disjoint copy of the business, exactly how a 10×
  * bigger warehouse looks. Dimensions (region, nation) stay fixed;
  * timestamps stay fixed (10× busier business over the same window).
  *
  * Document TEXT is perturbed per replica (r9, VERDICT item 5): every
  * token of replica i>0 gets a deterministic `r<i>x` prefix, so
  * replicas share NO shingles with the original — without this, every
  * doc had `factor` verbatim copies, which both made the near-dup
  * family unrehearsable (artificial 10-way clone clusters whose
  * within-bucket pair counts grow quadratically in the factor) and
  * broke the "disjoint copy of the business" premise for text. The
  * within-replica duplicate structure is preserved exactly, which is
  * what a 10× bigger corpus looks like.
  *
  * The derived fixture lands OUTSIDE the read-only /root/testdata
  * (default /tmp/graft_sf1). Usage:
  *   graft.tools.ScaleGen [srcDir] [outDir] [factor] [tables]
  * `tables` (r11): optional comma-list restricting which tables are
  * written — a factor-100 DOCUMENTS-ONLY fixture for the q_mm fourth
  * scale point costs seconds instead of replicating the whole
  * warehouse (queries against a partial fixture must only touch the
  * written tables).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val only: Option[Set[String]] = args.lift(3).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = graft.sources.Tables(spark, src, name)
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1

    // Key-domain spans are computed LAZILY and only for domains the
    // selected tables actually remap (r11 ADVICE: a documents-only
    // fixture must not scan — or be blocked by checks on — the seven
    // source tables it never writes).
    val spanSource = Map(
      "cust" -> ("customer", "c_custkey"),
      "supp" -> ("supplier", "s_suppkey"),
      "part" -> ("part", "p_partkey"),
      "ord" -> ("orders", "o_orderkey"),
      "ev" -> ("events", "event_id"),
      "user" -> ("events", "user_id"),
      "doc" -> ("documents", "doc_id"),
      "vec" -> ("embeddings", "vec_id"))
    val spanCache = scala.collection.mutable.Map.empty[String, Long]
    def spans(dom: String): Long = spanCache.getOrElseUpdate(dom, {
      val (t, k) = spanSource(dom)
      span(tbl(t), k)
    })

    // per-table: (column -> key-domain) remappings; absent = copy as-is
    val remap: Map[String, Map[String, String]] = Map(
      "region" -> Map(),
      "nation" -> Map(),
      "customer" -> Map("c_custkey" -> "cust"),
      "supplier" -> Map("s_suppkey" -> "supp"),
      "part" -> Map("p_partkey" -> "part"),
      "orders" -> Map("o_orderkey" -> "ord", "o_custkey" -> "cust"),
      "lineitem" -> Map("l_orderkey" -> "ord", "l_partkey" -> "part",
        "l_suppkey" -> "supp"),
      "events" -> Map("event_id" -> "ev", "user_id" -> "user"),
      "documents" -> Map("doc_id" -> "doc"),
      "embeddings" -> Map("vec_id" -> "vec"))

    val selected = remap.filter(t => only.forall(_.contains(t._1)))

    // lpad TRUNCATES past the target width (r10 ADVICE): a shifted
    // key >= 1e9 would lose digits in the rebuilt Customer#/Supplier#
    // names below, silently COLLIDING distinct entities — the exact
    // artifact class the name rebuild exists to prevent. Fail loudly
    // at the factor where the 9-digit TPC-H name rule stops fitting.
    // Scoped to the tables actually being written (r11 ADVICE): a
    // documents-only fixture at an extreme factor must not be blocked
    // by a check on names it never rebuilds.
    for ((table, dom, nm) <- Seq(("customer", "cust", "c_custkey"),
                                 ("supplier", "supp", "s_suppkey"))
         if selected.contains(table)) {
      val maxShifted = spans(dom) - 1 + (factor - 1).toLong * spans(dom)
      require(maxShifted < 1000000000L,
        s"$nm at factor $factor reaches $maxShifted — exceeds the 9-digit " +
          "TPC-H name pad; widen the pad (and the oracle) before scaling this far")
    }

    selected.foreach { case (name, keys) =>
      val base = tbl(name)
      val scaled =
        if (keys.isEmpty) base
        else (0 until factor).map { i =>
          val shifted = keys.foldLeft(base) { case (df, (c, dom)) =>
            df.withColumn(c, col(c) + lit(i * spans(dom)))
          }
          if (name == "customer" && i > 0)
            // c_name is key-DERIVED in the fixture (Customer#<key>) —
            // a 30x bigger warehouse has 30x more DISTINCT customer
            // names, not 30 verbatim copies of each (r10: verbatim
            // replication made every deletion-signature block grow
            // with the factor, so entity resolution read QUADRATIC at
            // the sf3' point — a fixture artifact, the c_name sibling
            // of r9's document-text perturbation). Rebuild the name
            // from the shifted key, TPC-H's own rule.
            shifted.withColumn("c_name",
              concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
          else if (name == "supplier" && i > 0)
            // same key-derived rule for Supplier#<key>
            shifted.withColumn("s_name",
              concat(lit("Supplier#"), lpad(col("s_suppkey").cast("string"), 9, "0")))
          else if (name == "documents" && i > 0)
            shifted.withColumn("text",
              array_join(transform(split(col("text"), " "),
                t => concat(lit(s"r${i}x"), t)), " "))
          else if (name == "embeddings" && i > 0)
            // deterministic per-(replica, dim) jitter (±0.003 max, RNG
            // free): identical replica vectors would give every ANN
            // query 10-way distance ties — artificial at any scale.
            // Modulus 13 > factor and a dim coefficient coprime to it
            // (r10, ADVICE fix: the old `j*7 % 7` was dim-INDEPENDENT
            // and identically zero for replicas 1 and 8 — verbatim
            // copies): i*131 ≡ i (mod 13) separates every replica
            // pair, and 17 ≡ 4 (mod 13) cycles over dims so no
            // replica's jitter vector is constant, let alone zero.
            shifted.withColumn("embedding",
              zip_with(col("embedding"),
                sequence(lit(0), size(col("embedding")) - 1),
                (x, j) => (x + ((lit(i) * 131 + j * 17) % 13 - 6)
                  .cast("float") * lit(0.0005f)).cast("float")))
          else shifted
        }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"ScaleGen: wrote $name x${if (keys.isEmpty) 1 else factor}")
    }
    spark.stop()
  }
}
