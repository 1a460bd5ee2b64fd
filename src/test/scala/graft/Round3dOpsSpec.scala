package graft

import org.apache.spark.sql.functions._

/** Round-3d operators (statistical tests + retrieval scoring):
  * brute-force replications of the integer-exact statistic cores, plan
  * contracts on the broadcast shapes, and distribution invariants.
  */
class Round3dOpsSpec extends SparkSpec {

  private def events = spark.read.parquet(s"$sf/events.parquet")

  test("q_stat_3_ks: integer numerator matches a brute-force ECDF sweep") {
    val a = events.filter(col("event_type") === "click")
      .select("value").collect().map(_.getDouble(0)).sorted
    val b = events.filter(col("event_type") === "view")
      .select("value").collect().map(_.getDouble(0)).sorted
    val grid = (a ++ b).distinct.sorted
    def cumAt(xs: Array[Double], x: Double): Long = {
      // count of elements <= x in a sorted array
      var lo = 0; var hi = xs.length
      while (lo < hi) { val m = (lo + hi) >>> 1; if (xs(m) <= x) lo = m + 1 else hi = m }
      lo.toLong
    }
    val expected = grid.map(x => math.abs(b.length * cumAt(a, x) - a.length * cumAt(b, x))).max
    val row = Registry.byName("q_stat_3_ks").fn(spark, sf).collect().head
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    assert(row.getLong(2) == expected, s"d_num ${row.getLong(2)} != brute-force $expected")
    val d = row.getDouble(3)
    assert(d >= 0.0 && d <= 1.0)
    assert(math.abs(d - expected.toDouble / (a.length.toLong * b.length)) < 1e-6)
  }

  test("q_stat_4_mannwhitney: doubled rank sum matches an average-rank replication") {
    val a = events.filter(col("event_type") === "purchase")
      .select("value").collect().map(_.getDouble(0))
    val b = events.filter(col("event_type") === "signup")
      .select("value").collect().map(_.getDouble(0))
    // average ranks over the pooled sample, doubled to stay integral
    val pooled = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    val twoR1 = pooled.groupBy(_._1).map { case (v, grp) =>
      val rLo = pooled.count(_._1 < v) + 1L
      val c = grp.length.toLong
      grp.count(_._2).toLong * (2 * rLo + c - 1)
    }.sum
    val row = Registry.byName("q_stat_4_mannwhitney").fn(spark, sf).collect().head
    assert(row.getLong(0) == a.length && row.getLong(1) == b.length)
    assert(row.getLong(2) == twoR1, s"two_r1 ${row.getLong(2)} != replication $twoR1")
    // U1 + U2 = n1·n2 (doubled: two_u1 + two_u2 = 2·n1·n2)
    val n = (a.length + b.length).toLong
    val twoR2 = n * (n + 1) - twoR1
    val twoU2 = twoR2 - b.length.toLong * (b.length + 1)
    assert(row.getLong(3) + twoU2 == 2L * a.length * b.length)
    assert(!row.getDouble(4).isNaN)
  }

  test("q_dq_16_benford: digits partition the table, shares sum to 1, constants exact") {
    val rows = Registry.byName("q_dq_16_benford").fn(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total, "every order has exactly one leading digit")
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val expect = math.floor(math.log10(1.0 + 1.0 / r.getLong(0)) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) == expect, s"benford_pct for digit ${r.getLong(0)}")
    }
  }

  test("q_text_22_bm25: top-10 matches a quantized-integer replication") {
    val terms = Set("vector", "merge", "filter")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = docs.length.toLong
    val tot = docs.map(_._2.length.toLong).sum
    val avgdl = tot.toDouble / n.toDouble
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val s6: Map[Long, Long] = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      terms.toSeq.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5))
          val s = idf * (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
          Some(id -> math.floor(s * 1000000 + 0.5).toLong)
        }
      }
    }.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum }
    val expected = s6.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = Registry.byName("q_text_22_bm25").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._3).toSeq == (1L to 10L), "ranks are dense 1..10")
    assert(got.map(_._1).toSeq == expected.map(_._1),
      s"doc order ${got.map(_._1).toSeq} != ${expected.map(_._1)}")
    got.zip(expected).foreach { case ((_, score, _), (_, e6)) =>
      assert(score == e6.toDouble / 1000000, "quantized score must be bit-exact")
    }
  }

  test("q_agg_27_trimmed_mean: keeps ~80% per group, mean within kept bounds") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val counts = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Registry.byName("q_agg_27_trimmed_mean").fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    rows.foreach { r =>
      val flag = r.getString(0); val kept = r.getLong(1); val mean = r.getDouble(2)
      val total = counts(flag)
      assert(kept >= (total * 0.78).toLong && kept <= (total * 0.82).toLong + 2,
        s"$flag kept $kept of $total — not ~80%")
      // the trimmed mean lies strictly inside the untrimmed value range
      val mm = li.filter(col("l_returnflag") === flag)
        .agg(min("l_extendedprice"), max("l_extendedprice")).collect().head
      assert(mean > mm.getDouble(0) && mean < mm.getDouble(1))
    }
  }

  test("q_text_23_perplexity: buckets are balanced terciles, ppl consistent with sum_l6") {
    val rows = Registry.byName("q_text_23_perplexity").fn(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs, "every doc has >=10 tokens so none loses its bigram row")
    val byBucket = rows.groupBy(_.getLong(4)).view.mapValues(_.length).toMap
    assert(byBucket.keySet == Set(1L, 2L, 3L))
    assert(byBucket.values.max - byBucket.values.min <= 1, s"ntile balance: $byBucket")
    rows.foreach { r =>
      val expect = math.floor(
        math.exp(-(r.getLong(2).toDouble / (r.getLong(1).toDouble * 1000000.0))) * 1e4 + 0.5) / 1e4
      assert(r.getDouble(3) == expect, s"ppl mismatch for doc ${r.getLong(0)}")
      assert(r.getLong(2) < 0, "smoothed log probs are negative")
    }
    // head bucket has lower perplexity than tail on average
    def avgPpl(b: Long) = { val g = rows.filter(_.getLong(4) == b); g.map(_.getDouble(3)).sum / g.length }
    assert(avgPpl(1L) < avgPpl(3L))
  }

  test("q_agg_28_entropy: bounds, base conversion, and a brute-force replication") {
    val rows = Registry.byName("q_agg_28_entropy").fn(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect().map(r => r.getString(0) -> r.getString(1))
    rows.foreach { r =>
      val lang = r.getString(0)
      val toks = docs.filter(_._1 == lang).flatMap(_._2.split(" "))
      val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(r.getLong(1) == toks.length.toLong && r.getLong(2) == counts.size.toLong)
      val h6 = counts.values.map { c =>
        val p = c.toDouble / toks.length.toDouble
        math.floor(-p * math.log(p) * 1000000 + 0.5).toLong
      }.sum
      assert(r.getLong(3) == h6, s"$lang h6 ${r.getLong(3)} != replication $h6")
      // 0 <= H <= ln(vocab)  =>  0 <= h_norm <= 1 (+quantization slack)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0001)
    }
  }

  test("q_scan_15_partition_prune: scan carries a lang partition filter") {
    val df = Registry.byName("q_scan_15_partition_prune").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "pruning must happen at the partition index")
    assert(plan.contains("lang"), "the filter column is the partition key")
    // the pruned read equals the source-side filter
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "fr").select("doc_id", "n_chars")
      .orderBy("doc_id").collect().toSeq
    assert(df.collect().toSeq == expected)
  }

  test("q_agg_29_gini: matches a sorted-rank replication; bounds hold") {
    val rows = Registry.byName("q_agg_29_gini").fn(spark, sf).collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderpriority", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong, r.getLong(2)))
    rows.foreach { r =>
      val prio = r.getString(0)
      val xs = orders.filter(_._1 == prio).sortBy(t => (t._2, t._3)).map(_._2)
      val n = xs.length.toLong
      val s = xs.sum
      val w = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val gini = math.floor((2 * w - (n + 1) * s).toDouble / (n * s).toDouble * 1e6 + 0.5) / 1e6
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == gini, s"$prio gini ${r.getDouble(2)} != $gini")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
    }
  }

  test("q_dq_17_cusum: matches a prefix-sum replication; invariant under shift sign") {
    val rows = Registry.byName("q_dq_17_cusum").fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong,
        r.getLong(2), r.getInt(3)))
    li.groupBy(_._1).foreach { case (k, grp) =>
      val xs = grp.sortBy(t => (t._3, t._4, t._2)).map(_._2)
      val n = xs.length.toLong
      val s = xs.sum
      var p = 0L; var i = 0L; var best = 0L
      xs.foreach { x => p += x; i += 1; best = math.max(best, math.abs(n * p - i * s)) }
      assert(rows(k) == ((n, best)), s"supplier $k: ${rows(k)} != ${(n, best)}")
    }
  }

  test("q_dq_18_psi: buckets partition both samples, reference deciles balanced") {
    val rows = Registry.byName("q_dq_18_psi").fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "all 10 buckets populated")
    val na = events.filter(col("event_type") === "click").count()
    val nb = events.filter(col("event_type") === "view").count()
    assert(rows.map(_.getLong(1)).sum == na && rows.map(_.getLong(2)).sum == nb)
    // decile boundaries come from the reference sample: its buckets are
    // near-equal (ties can shift a few rows across a boundary)
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - na / 10.0) <= math.max(2.0, na * 0.05),
        s"bucket ${r.getLong(0)} reference count ${r.getLong(1)} not ~${na / 10}")
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
  }

  test("q_sim_15_cluster_purity: clusters partition the sample, majority is the mode") {
    val rows = Registry.byName("q_sim_15_cluster_purity").fn(spark, sf).collect()
    val sample = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 200).count()
    assert(rows.map(_.getLong(1)).sum == sample, "every sampled vector lands in one cluster")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "majority count bounded by cluster size")
      val purity = r.getDouble(4)
      assert(purity > 0.0 && purity <= 1.0)
      assert(purity == math.floor(r.getLong(3).toDouble / r.getLong(1).toDouble * 1e6 + 0.5) / 1e6)
    }
  }

  test("q_text_24_pmi: top-20 matches a quantized-integer replication") {
    val bigrams = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().flatMap { r =>
        val t = r.getString(0).split(" "); t.dropRight(1).zip(t.drop(1))
      }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c2 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = bigrams.length.toLong
    val expected = c12.toSeq.filter(_._2 >= 20).map { case ((w1, w2), c) =>
      val pmi6 = math.floor(math.log(
        c.toDouble * nn.toDouble / (c1(w1).toDouble * c2(w2).toDouble)) * 1000000 + 0.5).toLong
      (w1, w2, c, pmi6)
    }.sortBy(t => (-t._4, t._1, t._2)).take(20)
    val got = Registry.byName("q_text_24_pmi").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gw1, gw2, gc, gpmi), (ew1, ew2, ec, e6)) =>
      assert((gw1, gw2, gc) == ((ew1, ew2, ec)))
      assert(gpmi == e6.toDouble / 1000000)
    }
  }

  test("plan contracts: single-scan statistics (totals ride windows, not rescans)") {
    // the round-3d audit found totals/marginal branches re-deriving
    // their inputs (psi 6 scans, pmi 4); these pins keep them fixed
    def scans(q: String): Int =
      "(?m)^\\(\\d+\\) Scan parquet".r.findAllIn(
        Registry.byName(q).fn(spark, sf).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))).length
    // r8: ks/mannwhitney route their ECDF cumsums through
    // Pipelines.prefixSum(N), which localCheckpoints the
    // range-partitioned distinct-value grid — the single corpus scan
    // happens inside that materialization, so the FINAL plan reads the
    // checkpoint (0 parquet scans) and still cannot rescan the corpus
    assert(scans("q_stat_3_ks") == 0)
    assert(scans("q_stat_4_mannwhitney") == 0)
    assert(scans("q_dq_16_benford") == 1)
    assert(scans("q_agg_28_entropy") == 1)
    // r9: pmi's global total is a broadcast 1-row aggregate of the SAME
    // lm plan (the global-total WINDOW it replaced forced the bigram
    // table into one partition) — 2 scans in the INITIAL plan, deduped
    // to one at runtime by AQE stage reuse, asserted below
    assert(scans("q_text_24_pmi") == 2)
    assert(scans("q_dq_18_psi") <= 3)
  }

  test("plan contract: pmi's two lm branches dedup at runtime (AQE stage reuse)") {
    val df = Registry.byName("q_text_24_pmi").fn(spark, sf)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert("ReusedExchange|ReusedQueryStage".r.findAllIn(finalPlan).nonEmpty,
      "the lm exchange must be reused, not rescanned — pairwise diamonds dedup, " +
        "3+-way mixed-key diamonds do not (r9 measurement)")
  }

  test("plan contracts: stat/boundary tables broadcast, no corpus merge joins") {
    def plan(q: String): String =
      Registry.byName(q).fn(spark, sf).queryExecution.executedPlan.toString
    assert(plan("q_agg_27_trimmed_mean").contains("BroadcastExchange"),
      "the 3-row percentile-boundary table must broadcast")
    assert(!plan("q_agg_27_trimmed_mean").contains("SortMergeJoin"))
    assert(plan("q_text_22_bm25").contains("BroadcastExchange"),
      "df/corpus-stats tables must broadcast")
    assert(!plan("q_dq_16_benford").contains("SortMergeJoin"))
  }
}
