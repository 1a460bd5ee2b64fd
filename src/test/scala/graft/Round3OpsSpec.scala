package graft

import graft.expressions.VectorExpressions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-3b operators: plan-shape contracts, semantic invariants on
  * synthetic corpora, and the batch/streaming twin agreement.
  */
class Round3OpsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r3_docs").toString
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q_text_17_repetition: all-same-token doc flagged, diverse doc clean") {
    val dir = writeDocs(Seq(
      (0L, "a a a a a a a a a a", "en"),
      (1L, "the quick brown fox jumps over the2 lazy dog now", "en")))
    val r = Registry.byName("q_text_17_repetition").fn(spark, dir)
      .collect().map(x => x.getLong(0) -> x).toMap
    val d0 = r(0L)
    assert(d0.getLong(1) == 10L)
    assert(d0.getDouble(2) == 0.9) // 10 tokens, 1 distinct
    assert(d0.getDouble(3) == 1.0) // every bigram is "a a"
    assert(d0.getLong(4) == 1L)
    val d1 = r(1L)
    assert(d1.getDouble(2) == 0.0)
    assert(d1.getLong(4) == 0L, "all-distinct doc must not be flagged")
  }

  test("q_text_18_novelty: mirrored doc scores 0, unique doc scores 1") {
    val dir = writeDocs(Seq(
      (0L, "x y z w", "en"),
      (1L, "x y z w", "en"), // exact mirror: every bigram shared
      (2L, "p q r s1", "en")))
    val r = Registry.byName("q_text_18_novelty").fn(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(0L) == 0.0 && r(1L) == 0.0, "mirror docs share every bigram")
    assert(r(2L) == 1.0, "unshared doc is fully novel")
  }

  test("q_sim_13_semdedup: every drop decision re-verifies against raw cosines") {
    VectorExpressions.register(spark)
    val res = Registry.byName("q_sim_13_semdedup").fn(spark, sf).collect()
    assert(res.nonEmpty)
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    res.foreach { r =>
      val (dropId, keepId) = (r.getLong(0), r.getLong(1))
      assert(keepId < dropId, "keeper is always the lower id")
      assert(cos(emb(dropId), emb(keepId)) >= 0.35 - 1e-9,
        s"pair ($keepId,$dropId) below threshold")
    }
  }

  test("q_join_17_bloom: identical to the plain join, with the bloom filter planned pre-join") {
    val bloom = Registry.byName("q_join_17_bloom").fn(spark, sf)
    val rows = bloom.collect()
    assert(rows.nonEmpty)
    val o = Tables(spark, sf, "orders").filter(col("o_totalprice") > 490000)
      .select("o_orderkey", "o_orderpriority")
    val plain = Tables(spark, sf, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100 + 0.5)).cast("long").as("price_cents"))
      .orderBy("o_orderpriority")
      .collect()
    assert(rows.toSeq == plain.toSeq,
      "bloom pre-filter must be semantics-neutral (exact join removes false positives)")
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "the probe-side scan must carry the bloom filter:\n" + plan)
  }

  test("q_stream_9_interval_join: batch result equals the streaming twin's join semantics") {
    val batch = Registry.byName("q_stream_9_interval_join").fn(spark, sf)
      .select("purchase_id", "click_id")
    val twin = graft.streaming.Streams
      .clickPurchaseJoin(Tables(spark, sf, "events")) // watermarks are no-ops in batch
      .select("purchase_id", "click_id")
    assert(batch.count() > 0)
    assert(batch.except(twin).count() == 0 && twin.except(batch).count() == 0,
      "declared batch query and Streams.clickPurchaseJoin must emit the same pairs")
  }

  test("q_sink_2_zorder: morton interleave is correct and written files have disjoint zkey ranges") {
    // Interleave ground truth on small values: morton(x=1,y=0)=1,
    // morton(0,1)=2, morton(3,3)=15, morton(2,1)=6.
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    assert(morton(1, 0) == 1L && morton(0, 1) == 2L && morton(3, 3) == 15L && morton(2, 1) == 6L)

    Registry.byName("q_sink_2_zorder").fn(spark, sf).collect() // runs the write
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_rt_zorder_${spark.sparkContext.applicationId}"
    val parts = new java.io.File(tmp).listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length > 1, "repartitionByRange(8) must produce multiple files")
    val ranges = parts.map { f =>
      val mm = spark.read.parquet(f.getAbsolutePath)
        .agg(min("zkey"), max("zkey")).head
      (mm.getLong(0), mm.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(lo2 >= hi, s"file zkey ranges overlap: $hi vs $lo2 — z-order pruning broken")
      case _ =>
    }
  }

  test("q_text_18_novelty: AQE broadcasts the un-hinted document-frequency table") {
    val df = Registry.byName("q_text_18_novelty").fn(spark, sf)
    df.count() // materialize so AQE's final (measured-size) plan is visible
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the vocab-sized DF table must broadcast at this scale without a hint:\n" + plan)
  }

  test("q_join_17_bloom: the might_contain filter sits directly over the fact scan") {
    val plan = Registry.byName("q_join_17_bloom").fn(spark, sf)
      .queryExecution.executedPlan.toString
    val lines = plan.split("\n")
    val fi = lines.indexWhere(_.contains("might_contain"))
    assert(fi >= 0, "bloom probe missing from the plan:\n" + plan)
    val si = lines.indexWhere(l => l.contains("FileScan") && l.contains("lineitem"), fi)
    assert(si > fi, "fact scan must be under the bloom filter:\n" + plan)
    assert(!lines.slice(fi + 1, si).exists(_.contains("Join")),
      "the bloom filter must prune BEFORE the join, not after:\n" + plan)
  }

  test("q_graph_4_components: the converged result plan reads checkpointed labels, not lineitem") {
    val plan = Registry.byName("q_graph_4_components").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem"),
      "iteration-invariant edges must be localCheckpointed — re-deriving the " +
        "fact self-join per round was the round-2 PageRank regression:\n" + plan)
  }

  test("q_dq_12/q_dq_13: key-level full-outer joins stay equi-joins (no nested loop)") {
    for (n <- Seq("q_dq_12_tablediff", "q_dq_13_upsert")) {
      val plan = Registry.byName(n).fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$n must join on the key:\n" + plan)
      assert(plan.contains("FullOuter"), s"$n must be a full-outer merge:\n" + plan)
    }
  }

  test("q_dq_12_tablediff: classification counts reconcile with the injected drift") {
    val r = Registry.byName("q_dq_12_tablediff").fn(spark, sf).head
    val o = Tables(spark, sf, "orders")
    val nDropped = o.filter(col("o_orderkey") % 97 === 0).count()
    val nAdded = o.filter(col("o_orderkey") % 103 === 0).count()
    val nPerturbed = o.filter(col("o_orderkey") % 101 === 0 && col("o_orderkey") % 97 =!= 0).count()
    val nTotal = o.count()
    assert(r.getLong(0) == nDropped, "n_only_left must equal the dropped keys")
    assert(r.getLong(1) == nAdded, "n_only_right must equal the injected keys")
    assert(r.getLong(2) == nPerturbed, "n_value_diff must equal the perturbed surviving keys")
    assert(r.getLong(0) + r.getLong(2) + r.getLong(3) == nTotal,
      "every v1 key must be classified exactly once")
  }

  test("q_dq_13_upsert: merge counts reconcile and untouched rows survive byte-for-byte") {
    val rows = Registry.byName("q_dq_13_upsert").fn(spark, sf).collect()
    val o = Tables(spark, sf, "orders")
    val nUpd = o.filter(col("o_orderkey") % 11 === 0).count()
    val nIns = o.filter(col("o_orderkey") % 113 === 0).count()
    val nBase = o.count()
    assert(rows.map(_.getLong(2)).sum == nIns, "inserted count must equal the changeset inserts")
    assert(rows.map(_.getLong(3)).sum == nUpd, "updated count must equal the changeset updates")
    assert(rows.map(_.getLong(1)).sum == nBase + nIns, "merge must keep every base row once")
  }

  test("q_scan_11_binaryfile: lengths and names agree with the filesystem") {
    val got = Registry.byName("q_scan_11_binaryfile").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val fsFiles = new java.io.File(sf).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(got.keySet == fsFiles.map(_.getName).toSet)
    assert(got.values.forall(identity), "every fixture blob is non-empty")
    // length metadata (excluded from the declared output for golden
    // stability) must still match the filesystem through the source
    val lens = spark.read.format("binaryFile").option("pathGlobFilter", "*.parquet").load(sf)
      .select(element_at(split(col("path"), "/"), -1), col("length"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fsFiles.foreach(f => assert(lens(f.getName) == f.length(), s"${f.getName} length drift"))
  }

  test("q_scan_13_hash_sample: the sample is exactly the 100 smallest hash priorities") {
    val got = Registry.byName("q_scan_13_hash_sample").fn(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val expected = Tables(spark, sf, "orders").select(col("o_orderkey"))
      .collect().map(_.getLong(0))
      .sortBy(k => ((k % 1000000007L) * 2654435761L % 1000000007L, k))
      .take(100).toSet
    assert(got == expected)
  }

  test("q_dedup_9_entity: exact rows self-resolve at dist 0, perturbed rows resolve at dist 1") {
    val rows = Registry.byName("q_dedup_9_entity").fn(spark, sf).collect()
    val byId = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val keys = Tables(spark, sf, "customer").select(col("c_custkey"))
      .collect().map(_.getLong(0))
    keys.filter(_ % 7 != 0).foreach { k =>
      assert(byId(k + 1000000L) == (k, 0L), s"unperturbed $k must self-match exactly")
    }
    keys.filter(_ % 7 == 0).foreach { k =>
      // exact dist<=1 semantics pin the winner: any OTHER customer
      // differs from the perturbed name at '#'->'-' plus >=1 digit
      assert(byId(k + 1000000L) == (k, 1L),
        s"perturbed $k must resolve to its original at edit distance 1")
    }
  }

  test("deletion-neighborhood blocking catches a dist-1 edit in the LAST 3 chars " +
    "(the pair class last-3-chars blocking silently dropped)") {
    // adjacent custkeys differ only in the final digit: dist 1, but
    // their last-3-chars blocks differ — under the old blocking these
    // pairs never became candidates. With exact semantics the winner
    // is still the dist-0 self-match; prove the CANDIDATE layer sees
    // the suffix-edit pair by checking two suffix-neighbors share a
    // deletion signature.
    def delKeys(s: String): Set[String] =
      (0 to s.length).map(i => if (i == 0) s else s.substring(0, i - 1) + s.substring(i)).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val a = "Customer#000000001"
    val b = "Customer#000000002"
    assert(lev(a, b) == 1)
    assert(a.takeRight(3) != b.takeRight(3), "pair must cross last-3 blocks")
    assert((delKeys(a) intersect delKeys(b)).nonEmpty,
      "Levenshtein<=1 pair must share a deletion signature")
  }

  test("GraftExtensions injects the bloom functions into a fresh session") {
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.expressions.GraftExtensions)
        .getOrCreate()
      val present = s2.sql(
        """SELECT might_contain(
          |  (SELECT bloom_agg(id, CAST(100 AS BIGINT), CAST(8000 AS BIGINT)) FROM range(100)),
          |  xxhash64(CAST(5 AS BIGINT)))""".stripMargin).head.getBoolean(0)
      assert(present, "an inserted key must test positive")
      assert(s2.sql(
        """SELECT cosine_similarity(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
          |                         CAST(array(1.0, 0.0) AS ARRAY<FLOAT>))""".stripMargin)
        .head.getDouble(0) == 1.0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("q_stream_10_incremental: partial-aggregate merge equals the single-pass aggregate") {
    val merged = Registry.byName("q_stream_10_incremental").fn(spark, sf).collect().toSeq
    val direct = Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        graft.functions.Num.round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id").collect().toSeq
    assert(merged == direct, "count/sum must be algebraic under batch-wise merge")
  }

  test("q_stream_11_pattern: lead() formulation equals a per-user fold over the sorted log") {
    val got = Registry.byName("q_stream_11_pattern").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues { rows =>
        val types = rows
          .sortBy(r => (r.getTimestamp(2).getTime / 1000, r.getTimestamp(2).getNanos, r.getLong(3)))
          .map(_.getString(1))
        types.sliding(2).count { case Array(a, b) => a == "view" && b == "purchase"; case _ => false }.toLong
      }.toMap.filter(_._2 > 0)
    assert(got == expected)
  }
}
