package graft

import graft.functions.Skew
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Sinks, skew utilities, bucketing, and the custom-state sessionizer. */
class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("orc roundtrip preserves content") {
    val out = Registry.byName("q_scan_8_orc_roundtrip").fn(spark, sf)
    val src = graft.sources.Tables(spark, sf, "supplier").orderBy("s_suppkey")
    assert(out.collect().toSeq == src.collect().toSeq)
  }

  test("partitioned write creates one directory per partition value") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part_test").toString
    graft.sources.Tables(spark, sf, "orders").write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(tmp)
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("o_orderpriority=")).sorted
    assert(dirs.length == 5, dirs.mkString(","))
    // partition pruning: a filter on the partition column reads 1 dir
    val pruned = spark.read.parquet(tmp)
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      graft.sources.Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").count())
    assert(plan.contains("PartitionFilters") || !plan.contains("o_orderpriority=2"))
  }

  test("salted join equals plain join, salts spread the hot key") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
    val p = graft.sources.Tables(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand"))
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedJoin(
      li.withColumnRenamed("l_partkey", "p_partkey"), p,
      key = "p_partkey", n = 4, saltSource = Seq("l_orderkey", "l_linenumber"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    assert(plain.orderBy("p_brand").collect().toSeq ==
      salted.orderBy("p_brand").collect().toSeq)
  }

  test("key histogram surfaces heavy hitters in order") {
    val h = Skew.keyHistogram(
      graft.sources.Tables(spark, sf, "orders"), "o_orderpriority", 5).collect()
    assert(h.length == 5)
    assert(h.map(_.getLong(1)).toSeq == h.map(_.getLong(1)).sortBy(-_).toSeq)
  }

  test("bucketed tables sort-merge join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.contains("graft_wh"), s"test warehouse expected, got $wh")
    val o = graft.sources.Tables(spark, sf, "orders")
    val li = graft.sources.Tables(spark, sf, "lineitem")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    // Disable broadcast so the planner must co-locate — the point of
    // bucketing is the shuffle-FREE sort-merge join on the bucket key.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        "bucketed join must be shuffle-free:\n" + plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flatMapGroupsWithState sessionizer agrees with session_window") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Streams.SessionEvent]
    val custom = Streams.sessionize(ev, 30)
      .orderBy("user_id", "session_start_us")
      .select("user_id", "session_start_us", "n_events").collect().toSeq
    val builtin = Registry.byName("q_stream_3_session").fn(spark, sf)
      .select(col("user_id"), unix_micros(col("session_start")).as("session_start_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us").collect().toSeq
    assert(custom == builtin)
  }
}
