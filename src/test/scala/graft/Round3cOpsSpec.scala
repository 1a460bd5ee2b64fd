package graft

import graft.expressions.TopKByAgg
import org.apache.spark.sql.functions._

/** Round-3c operators: plan-shape contracts (the native top-k must not
  * regress to a window sort), partitioning-invariance of the mergeable
  * aggregate, and semantic invariants on fixture + synthetic data.
  */
class Round3cOpsSpec extends SparkSpec {

  test("registry: declared names are unique and well-formed") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length, "duplicate declared query name")
    assert(names.forall(_.matches("q_[a-z0-9_]+")))
  }

  test("plan contracts: broadcast shapes, no corpus-side merge joins") {
    def plan(n: String): String =
      Registry.byName(n).fn(spark, sf).queryExecution.executedPlan.toString
    // boundary/stat/total tables are tiny: they must arrive by broadcast,
    // never by co-shuffling the corpus
    assert(plan("q_sort_5_value_bucket").contains("BroadcastExchange"))
    assert(!plan("q_dq_15_skew_profile").contains("SortMergeJoin"))
    assert(!plan("q_sim_14_standardize").contains("SortMergeJoin"))
    assert(!plan("q_text_19_mixture").contains("SortMergeJoin"))
  }

  test("q_agg_23_topk_native: ObjectHashAggregate, zero Window nodes") {
    val df = Registry.byName("q_agg_23_topk_native").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "topk_by must aggregate through the object-hash path")
    assert(!plan.contains("Window"),
      "topk_by exists to avoid the window sort of the fact — none allowed")
  }

  test("topk_by equals the window formulation and is partitioning-invariant") {
    TopKByAgg.register(spark)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def run(parts: Int): Seq[org.apache.spark.sql.Row] =
      li.repartition(parts)
        .groupBy("l_suppkey")
        .agg(expr("topk_by(l_extendedprice, l_orderkey, l_linenumber, 3)").as("top"))
        .select(col("l_suppkey"), posexplode(col("top")))
        .select(col("l_suppkey"), col("pos"), col("col.ord"), col("col.tie1"), col("col.tie2"))
        .orderBy("l_suppkey", "pos").collect().toSeq
    val merged = run(13)
    assert(run(1) == merged, "merge order must not change the result")
    // cross-check against the window idiom the aggregate replaces
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li
      .select(col("l_suppkey"), row_number().over(w).as("rnk"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber").cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("l_suppkey"), (col("rnk") - 1).as("pos"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_suppkey", "pos").collect().toSeq
    assert(merged.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      == viaWindow.map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
  }

  test("q_graph_5_triangles: tallies are positive and sum to 3× a whole triangle count") {
    val rows = Registry.byName("q_graph_5_triangles").fn(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 handoff graph is known to contain triangles")
    assert(rows.forall(_.getLong(1) > 0))
    val total = rows.map(_.getLong(1)).sum
    assert(total > 0 && total % 3 == 0,
      s"each triangle contributes to exactly 3 node tallies, got $total")
  }

  test("q_text_19_mixture: quotas follow ceil(sqrt(n)·8) and are filled exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rawCounts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Registry.byName("q_text_19_mixture").fn(spark, sf).collect()
    val kept = out.groupBy(_.getString(1)).map { case (lang, rs) => lang -> rs.length.toLong }
    rawCounts.foreach { case (lang, n) =>
      val expected = math.min(n, math.ceil(math.sqrt(n.toDouble) * 8).toLong)
      assert(kept(lang) == expected, s"$lang: kept ${kept.get(lang)} expected $expected")
      assert(out.filter(_.getString(1) == lang).forall(_.getLong(3) == expected))
    }
    assert(out.map(_.getLong(0)).distinct.length == out.length, "no doc selected twice")
  }

  test("q_win_10_rolling_median: matches a reference rolling-median replication") {
    // replicate: per suppkey, sort by (okey, line, price), 7-row trailing
    // frame, linear-interpolated median at rank 0.5·(n−1)
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val idx = 0.5 * (s.length - 1)
      val lo = idx.toInt
      val hi = math.ceil(idx).toInt
      val m = s(lo) + (s(hi) - s(lo)) * (idx - lo)
      math.floor(m * 1e6 + 0.5) / 1e6
    }
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_suppkey") <= 10)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (sk, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3, r._4))
      ordered.zipWithIndex.map { case (r, i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._4).toSeq
        (sk, r._2, r._3, median(frame))
      }
    }.toSeq.sorted
    val got = Registry.byName("q_win_10_rolling_median").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq.sorted
    assert(got == expected)
  }

  test("q_join_18_asof_nearest: backward/forward/none/tie cases on a known stream") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_3c_events").toString
    def ns(sec: Long): Long = sec * 1000000000L
    // (event_id, ts_ns, user_id, event_type): user 1 nearer-backward,
    // user 2 forward-only, user 3 no clicks, user 4 exact tie → earlier
    Seq(
      (0L, ns(100), 1L, "click"), (1L, ns(130), 1L, "purchase"), (2L, ns(200), 1L, "click"),
      (3L, ns(50), 2L, "purchase"), (4L, ns(60), 2L, "click"),
      (5L, ns(70), 3L, "purchase"),
      (6L, ns(10), 4L, "click"), (7L, ns(20), 4L, "purchase"), (8L, ns(30), 4L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.byName("q_join_18_asof_nearest").fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(3)).map(_.getTime / 1000)).toMap
    assert(out(1L) == Some(100L), "backward click at 30s beats forward at 70s")
    assert(out(3L) == Some(60L), "forward-only match")
    assert(out(5L) == None, "no clicks for user 3")
    assert(out(7L) == Some(10L), "exact-distance tie resolves to the earlier click")
  }

  test("countmin: partitioning-invariant and never under-counts any key") {
    graft.expressions.CountMinAgg.register(spark)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    def sk(parts: Int): Seq[Long] =
      li.repartition(parts).agg(expr("countmin(l_partkey, 512, 4)").as("cm"))
        .collect()(0).getSeq[Long](0)
    val sketch = sk(13)
    assert(sk(1) == sketch, "counter-wise merge must be partitioning-invariant")
    val exact = li.groupBy("l_partkey").count().collect()
    exact.foreach { r =>
      val pk = r.getLong(0)
      val est = (0 until 4)
        .map(j => sketch(j * 512 + graft.expressions.CountMinAgg.hash(pk, j, 512))).min
      assert(est >= r.getLong(1), s"CM must never under-count (key $pk)")
    }
  }

  test("q_mm_5_phash: identical rendered docs collide at distance 0") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_3c_docs").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different payload with other bytes 123456"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.byName("q_mm_5_phash").fn(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 1L)) == 0L, "same bytes → same decoded raster → same phash")
    // identical inputs must be interchangeable against any third doc
    assert(out.get((0L, 2L)) == out.get((1L, 2L)))
  }

  test("q_scan_14_stratified_hash: exactly 5 distinct keys per stratum, stable across runs") {
    def run() = Registry.byName("q_scan_14_stratified_hash").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val out = run()
    out.groupBy(_._1).foreach { case (prio, rs) =>
      assert(rs.map(_._2).sorted == Seq(1L, 2L, 3L, 4L, 5L), s"$prio: ranks 1..5")
      assert(rs.map(_._3).distinct.length == 5, s"$prio: 5 distinct orderkeys")
    }
    assert(run() == out, "hash sample must be reproducible run to run")
  }

  test("q_win_11_rolling_corr: 1-row head frames are NULL, values bounded by [-1, 1]") {
    val rows = Registry.byName("q_win_11_rolling_corr").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        val c = r.getDouble(4)
        assert(c >= -1.000001 && c <= 1.000001, s"corr out of range: $c")
      }
    }
    // the first row of every partition has a 1-row frame → zero variance → NULL
    val firstPerSupp = rows.groupBy(_.getLong(0)).map { case (_, rs) =>
      rs.minBy(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    }
    firstPerSupp.foreach(r => assert(r.isNullAt(4), s"head of suppkey ${r.getLong(0)}"))
  }

  test("q_sim_14_standardize: matches an exact-integer replication for vec 0") {
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = all.length.toLong
    val quant = all.map { case (id, v) =>
      id -> v.map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong)
    }
    val expected = (0 until 64).map { d =>
      val vis = quant.map(_._2(d))
      val s1 = vis.sum
      val s2 = vis.map(v => v * v).sum
      val dvar = n * s2 - s1 * s1
      val vi0 = quant.find(_._1 == 0L).get._2(d)
      if (dvar > 0) Some(math.floor((n * vi0 - s1).toDouble / math.sqrt(dvar.toDouble) * 1e6 + 0.5) / 1e6)
      else None
    }
    val got = Registry.byName("q_sim_14_standardize").fn(spark, sf).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getLong(1))
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("q_sort_5_value_bucket: 4 disjoint buckets per priority covering all rows") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val totals = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Registry.byName("q_sort_5_value_bucket").fn(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (prio, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L, 4L)), s"$prio: 4 buckets")
      assert(rs.map(_.getLong(2)).sum == totals(prio), s"$prio: buckets partition the group")
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(3) + 1e-9, s"$prio: bucket value ranges overlap")
      }
    }
  }

  test("q_mm_6_audio_energy: frame energies match a per-byte replication") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 100).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Registry.byName("q_mm_6_audio_energy").fn(spark, sf).collect()
    assert(out.groupBy(_.getLong(0)).forall(_._2.length == 8), "8 frames of 32 samples each")
    val doc0 = docs(0L)
    val samples = (0 until 256).map(i => doc0.charAt(i % doc0.length).toInt - 128)
    out.filter(_.getLong(0) == 0L).foreach { r =>
      val f = r.getLong(1).toInt
      val frame = samples.slice(f * 32, f * 32 + 32)
      assert(r.getLong(2) == frame.map(s => s.toLong * s).sum, s"frame $f energy")
      assert(r.getLong(3) == frame.map(math.abs).max.toLong, s"frame $f peak")
      assert(r.getLong(4) == (if (frame.map(s => s.toLong * s).sum < 3200) 1L else 0L))
    }
  }

  test("bpe encode: merges apply greedily in rank order and round-trip losslessly") {
    val s = spark
    import s.implicits._
    val corpus = Seq("aaab", "aaab", "ab").toDF("tok")
      .select(split(col("tok"), "").as("syms"))
    val merges = graft.functions.Bpe.train(corpus, 2)
    // (a,a) occurs 4 times (twice per "aaab"), (a,b) 3 → merge 1 = (a,a);
    // after it, (a,b) still leads → merge 2 = (a,b)
    assert(merges.map(m => (m._2, m._3)) == Seq(("a", "a"), ("a", "b")))
    val enc = Seq("aaab").toDF("tok").select(split(col("tok"), "").as("syms"))
      .select(graft.functions.Bpe.encode(col("syms"), merges).as("e"))
      .collect()(0).getSeq[String](0)
    assert(enc == Seq("aa", "ab"), "greedy non-overlapping application: [a,a,a,b] → [aa,ab]")
    // lossless round trip over real corpus tokens with the learned table
    val rt = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 10)
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(col("tok"),
        concat_ws("", graft.functions.Bpe.encode(split(col("tok"), ""), merges)).as("rt"))
    assert(rt.filter(col("tok") =!= col("rt")).count() == 0,
      "concatenating encoded symbols must reproduce every token exactly")
  }

  test("q_text_20_bpe_encode: compression is non-negative and bounded by input size") {
    val rows = Registry.byName("q_text_20_bpe_encode").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "encoded symbols can never exceed input symbols")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
      assert(r.getLong(3) >= 0)
    }
  }

  test("q_dq_15_skew_profile: top key and ratios match exact counts") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val counts = li.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val nKeys = counts.size.toLong
    val rows = Registry.byName("q_dq_15_skew_profile").fn(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).sortBy(-_).toSeq)
    rows.foreach { r =>
      val (pk, n) = (r.getLong(0), r.getLong(1))
      assert(counts(pk) == n)
      assert(r.getDouble(2) == math.floor(n / total * 1e6 + 0.5) / 1e6)
      assert(r.getDouble(3) == math.floor(n * nKeys / total * 1e6 + 0.5) / 1e6)
    }
  }

  test("q_agg_25_weighted_median: matches a direct cumulative-weight replication") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong, r.getDouble(2).toLong))
    val expected = li.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val tw = sorted.map(_._3).sum
      var cw = 0L
      val v = sorted.find { r => cw += r._3; cw * 2 >= tw }.get._2
      flag -> math.floor(v.toDouble / 100 * 100 + 0.5) / 100
    }
    val got = Registry.byName("q_agg_25_weighted_median").fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("q_join_19_interval_overlap: bucketized band equals the naive inequality join") {
    val out = Registry.byName("q_join_19_interval_overlap").fn(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0), "emitted pairs must truly overlap")
    // re-derive both interval sets and join naively (quadratic — fine at
    // sf0.001) to prove the hour-bucket candidate generation lost nothing
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    val uw = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val runW = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev
      .withColumn("brk", when(lag("tus", 1).over(uw).isNull
        || col("tus") - lag("tus", 1).over(uw) > 3600000000L, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(runW))
      .groupBy("user_id", "sid").agg(min("tus").as("s1s"), max("tus").as("s1e"))
    val iw = Window.orderBy("tus", "event_id")
    val irunW = Window.orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inc = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("brk", when(lag("tus", 1).over(iw).isNull
        || col("tus") - lag("tus", 1).over(iw) > 1800000000L, 1).otherwise(0))
      .withColumn("iid", sum("brk").over(irunW))
      .groupBy("iid").agg(min("tus").as("i2s"), (max("tus") + 300000000L).as("i2e"))
    val naive = sess.crossJoin(inc)
      .filter(col("s1s") <= col("i2e") && col("i2s") <= col("s1e"))
      .select(col("user_id"), col("s1s"), col("i2s"))
      .orderBy("user_id", "s1s", "i2s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val banded = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(banded == naive, "band join must emit exactly the true overlap pairs")
  }

  test("q_graph_6_bfs: root at distance 0, every node reached through a parent") {
    val rows = Registry.byName("q_graph_6_bfs").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    val root = rows.keys.min
    assert(rows(root) == 0L, "source node must be at distance 0")
    assert(rows.values.forall(_ >= 0))
    // BFS invariant: every non-root reached node has distance = some
    // neighbor's distance + 1 (checked against the re-derived edge list)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") % 200 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // (okey, ln) is NOT unique in the fixtures: keep ALL suppkeys per
    // line number and cross them, as the join-based derivation does
    val edges = li.groupBy(_._1).values.flatMap { rs =>
      val byLn = rs.groupBy(_._2).map { case (ln, g) => ln -> g.map(_._3).toSet }
      byLn.flatMap { case (ln, ss) =>
        byLn.getOrElse(ln + 1, Set.empty[Long])
          .flatMap(t => ss.filter(_ != t).map(s => Set(s, t)))
      }
    }.toSet
    val nbrs = rows.keys.map { n =>
      n -> rows.keys.filter(m => m != n && edges.contains(Set(n, m)))
    }.toMap
    rows.filter(_._1 != root).foreach { case (n, dist) =>
      assert(nbrs(n).exists(m => rows(m) == dist - 1),
        s"node $n at dist $dist must have a parent at dist ${dist - 1}")
    }
  }

  test("q_agg_26_spearman: matches an average-rank replication") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    def doubledAvgRanks(vs: Seq[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      val first = sorted.zipWithIndex.groupBy(_._1).map { case (v, g) => v -> (g.head._2 + 1L) }
      val cnt = vs.groupBy(identity).map { case (v, g) => v -> g.length.toLong }
      first.map { case (v, r) => v -> (2 * r + cnt(v) - 1) }
    }
    val expected = li.groupBy(_._1).map { case (flag, rs) =>
      val n = rs.length.toLong
      val rq = doubledAvgRanks(rs.map(_._2).toSeq)
      val rp = doubledAvgRanks(rs.map(_._3).toSeq)
      val ds = rs.map(r => (rq(r._2) - n - 1, rp(r._3) - n - 1))
      val sxy = ds.map { case (a, b) => a * b }.sum
      val sxx = ds.map { case (a, _) => a * a }.sum
      val syy = ds.map { case (_, b) => b * b }.sum
      flag -> math.floor(sxy.toDouble / math.sqrt(sxx.toDouble * syy.toDouble) * 1e6 + 0.5) / 1e6
    }
    val got = Registry.byName("q_agg_26_spearman").fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("q_stat_1_chisq: full grid, marginals reconcile, contributions non-negative") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.count()
    val nLangs = docs.select("lang").distinct().count()
    val nSources = docs.select("source").distinct().count()
    val rows = Registry.byName("q_stat_1_chisq").fn(spark, sf).collect()
    assert(rows.length == nLangs * nSources, "every (lang, source) cell must appear")
    assert(rows.map(_.getLong(2)).sum == total, "observed counts must sum to the corpus")
    assert(rows.forall(_.getDouble(4) >= 0))
  }

  test("q_stat_2_abtest: counts reconcile and z sign follows the rate difference") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val r = Registry.byName("q_stat_2_abtest").fn(spark, sf).collect()(0)
    assert(r.getLong(0) + r.getLong(2) == ev.count())
    val k0 = ev.filter(col("user_id") % 2 === 0 && col("event_type") === "purchase").count()
    assert(r.getLong(1) == k0)
    assert((r.getDouble(6) > 0) == (r.getDouble(4) > r.getDouble(5))
      || r.getDouble(6) == 0.0)
  }

  test("q_text_21_token_budget: greedy prefix is maximal and within budget") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def prio(id: Long): Long = (id % 1000000007L) * 2654435761L % 1000000007L
    val out = Registry.byName("q_text_21_token_budget").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._2).foreach { case (lang, rs) =>
      val budget = rs.head._4
      val tot = docs.filter(_._2 == lang).map(_._3).sum
      assert(budget == math.min(tot, math.ceil(math.sqrt(tot.toDouble) * 64).toLong))
      assert(rs.map(_._3).max <= budget, s"$lang: kept prefix exceeds budget")
      // maximality: the NEXT doc in hash order would overflow the budget
      val kept = rs.map(_._1).toSet
      val ordered = docs.filter(_._2 == lang).sortBy(d => (prio(d._1), d._1))
      val next = ordered.find(d => !kept.contains(d._1))
      next.foreach { d =>
        assert(rs.map(_._3).max + d._3 > budget,
          s"$lang: doc ${d._1} would still fit — prefix not maximal")
      }
      // the kept set IS the prefix (no holes)
      assert(ordered.takeWhile(d => kept.contains(d._1)).length == kept.size)
    }
  }

  test("q_sort_4_ntile: buckets within a priority differ by at most one row") {
    val rows = Registry.byName("q_sort_4_ntile").fn(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (prio, rs) =>
      assert(rs.length == 4, s"$prio: expected 4 quartiles")
      val ns = rs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$prio: ntile buckets must be equal-frequency ±1")
      // quartile value ranges must not overlap: hi(q) <= lo(q+1)
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(3) + 1e-9,
          s"$prio: quartile ranges overlap")
      }
    }
  }
}
