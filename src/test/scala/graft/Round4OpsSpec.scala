package graft

import org.apache.spark.sql.functions._

/** Round-4 operators: brute-force replications of the integer-exact
  * cores, closed-form checks of the single-IEEE-expression floats, and
  * plan contracts (single corpus scan, broadcast stat tables).
  */
class Round4OpsSpec extends SparkSpec {

  private def docs =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "lang", "n_chars", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))

  /** (source, lang, rank) under the shared (n_chars DESC, doc_id) ranking. */
  private def ranked =
    docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(d => (-d._4, d._1)).zipWithIndex
        .map { case (d, i) => (src, d._3, i + 1L) }
    }

  private val w = (1 to 10).map(r => math.floor(1e6 * math.log(2) / math.log(r + 1.0) + 0.5).toLong)

  test("q_ret_1_ndcg: quantized DCG/IDCG replicate; ndcg==1 iff top-10 is all-relevant-first") {
    val expected = ranked.groupBy(_._1).map { case (src, rows) =>
      val rels = rows.sortBy(_._3).map(_._2 == "en")
      val dcg = rels.zipWithIndex.collect { case (true, i) if i < 10 => w(i) }.sum
      val nRel = rels.count(identity)
      val idcg = (0 until math.min(10, nRel)).map(w).sum
      src -> (rows.size.toLong, nRel.toLong,
        if (idcg > 0) math.floor(dcg.toDouble / idcg * 1000000 + 0.5) / 1000000 else 0.0)
    }
    val got = Registry.byName("q_ret_1_ndcg").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, nRel, ndcg) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == nRel)
      assert(r.getDouble(3) == ndcg, s"${r.getString(0)}: ${r.getDouble(3)} != $ndcg")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q_ret_2_mrr: first relevant rank replicates; rr is the fixed closed form") {
    val expected = ranked.groupBy(_._1).flatMap { case (src, rows) =>
      rows.filter(_._2 == "en").map(_._3).sorted.headOption.map(src -> _)
    }
    val got = Registry.byName("q_ret_2_mrr").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val first = expected(r.getString(0))
      assert(r.getLong(1) == first)
      assert(r.getDouble(2) == math.floor(1000000.0 / first + 0.5) / 1000000)
    }
  }

  test("q_ret_3_pr_at_k: counts replicate; precision/recall are the fixed closed forms") {
    val expected = ranked.groupBy(_._1).map { case (src, rows) =>
      val inK = rows.filter(r => r._3 <= 10 && r._2 == "en").size.toLong
      val nRel = rows.count(_._2 == "en").toLong
      src -> (inK, nRel)
    }
    val got = Registry.byName("q_ret_3_pr_at_k").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (inK, nRel) = expected(r.getString(0))
      assert(r.getLong(1) == inK && r.getLong(2) == nRel)
      assert(r.getDouble(3) == math.floor(inK.toDouble / 10 * 1000000 + 0.5) / 1000000)
      val rk = if (nRel > 0) math.floor(inK.toDouble / nRel * 1000000 + 0.5) / 1000000 else 0.0
      assert(r.getDouble(4) == rk)
    }
  }

  test("q_ret_4_map: quantized AP replicates a rank-walk; perfect prefix gives ap==1") {
    val expected = ranked.groupBy(_._1).map { case (src, rows) =>
      val rels = rows.sortBy(_._3).map(_._2 == "en")
      var cum = 0L
      var apq = 0L
      var relk = 0L
      rels.zipWithIndex.foreach { case (rel, i) =>
        if (rel) {
          cum += 1
          if (i < 10) { apq += cum * 1000000L / (i + 1); relk += 1 }
        }
      }
      src -> (rels.count(identity).toLong, apq, relk)
    }
    val got = Registry.byName("q_ret_4_map").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nRel, apq, relk) = expected(r.getString(0))
      assert(r.getLong(1) == nRel)
      assert(r.getLong(2) == apq, s"${r.getString(0)}: apq ${r.getLong(2)} != $apq")
      val ap = if (relk > 0)
        math.floor(apq.toDouble / relk / 1000000 * 1000000 + 0.5) / 1000000 else 0.0
      assert(r.getDouble(3) == ap)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q_ml_1_kfold: folds partition the corpus; assignment matches the id hash") {
    val fold = (id: Long) => ((id % 1000000007L) * 2654435761L) % 1000000007L % 5
    val byFold = docs.groupBy(d => fold(d._1))
    val got = Registry.byName("q_ml_1_kfold").fn(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == docs.length)
    got.foreach { r =>
      val ds = byFold(r.getLong(0))
      assert(r.getLong(1) == ds.length)
      assert(r.getLong(2) == ds.map(_._3).distinct.length)
      val avg = math.floor(ds.map(_._4).sum.toDouble / ds.length * 100 + 0.5) / 100
      assert(r.getDouble(3) == avg)
    }
  }

  test("q_agg_32_winsorize: clamped-cents mean matches a sorted-interpolation replication") {
    val prices = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    def pct(xs: Array[Double], q: Double): Double = {
      val s = xs.sorted; val pos = q * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
    }
    val got = Registry.byName("q_agg_32_winsorize").fn(spark, sf).collect()
    got.foreach { r =>
      val xs = prices(r.getString(0)).map(_._2)
      val (p05, p95) = (pct(xs, 0.05), pct(xs, 0.95))
      val cents = xs.map { x =>
        if (x < p05) math.floor(p05 * 100 + 0.5).toLong
        else if (x > p95) math.floor(p95 * 100 + 0.5).toLong
        else math.floor(x * 100 + 0.5).toLong
      }
      assert(r.getLong(1) == xs.length)
      val m = math.floor(cents.sum.toDouble / (xs.length.toDouble * 100) * 100 + 0.5) / 100
      assert(r.getDouble(2) == m, s"${r.getString(0)}: ${r.getDouble(2)} != $m")
    }
  }

  test("q_text_29_source_caps: kept+dropped partition each source at the cap") {
    val got = Registry.byName("q_text_29_source_caps").fn(spark, sf).collect()
    val bySrc = docs.groupBy(_._2)
    assert(got.length == bySrc.size)
    got.foreach { r =>
      val n = bySrc(r.getString(0)).length.toLong
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == math.min(15L, n))
      assert(r.getLong(2) + r.getLong(3) == n)
    }
  }

  test("q_text_30_hapax: per-lang vocab and singleton counts replicate") {
    val counts = docs.flatMap(d => d._5.split(" ").map((d._3, _)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val byLang = counts.keys.groupBy(_._1)
    val got = Registry.byName("q_text_30_hapax").fn(spark, sf).collect()
    got.foreach { r =>
      val toks = byLang(r.getString(0))
      val hapax = toks.count(counts(_) == 1).toLong
      assert(r.getLong(1) == toks.size)
      assert(r.getLong(2) == hapax)
      assert(r.getDouble(3) == math.floor(hapax.toDouble / toks.size * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_text_31_top_tokens: top-5 by (n DESC, token) replicate with shares") {
    val counts = docs.flatMap(d => d._5.split(" ").map((d._3, _)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Registry.byName("q_text_31_top_tokens").fn(spark, sf).collect()
    counts.keys.groupBy(_._1).foreach { case (lang, keys) =>
      val total = keys.toSeq.map(counts).sum
      val top = keys.toSeq.map(k => (k._2, counts(k))).sortBy(t => (-t._2, t._1)).take(5)
      val rows = got.filter(_.getString(0) == lang).sortBy(_.getLong(1))
      assert(rows.length == math.min(5, keys.size))
      rows.zip(top).zipWithIndex.foreach { case ((r, (tok, n)), i) =>
        assert(r.getLong(1) == i + 1 && r.getString(2) == tok && r.getLong(3) == n)
        assert(r.getDouble(4) == math.floor(n.toDouble / total * 1000000 + 0.5) / 1000000)
      }
    }
  }

  test("q_time_7_resample: dense grid covers [min,max] for every type; totals preserved") {
    val got = Registry.byName("q_time_7_resample").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hours = got.map(_._2)
    val (lo, hi) = (hours.min, hours.max)
    val types = got.map(_._1).distinct
    assert(got.length == types.length * (hi - lo + 1))
    // every (type, hour) cell appears exactly once
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
    // zero-filled cells only where the raw stream has no events; totals match
    val raw = sources.Tables(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rawCounts = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (t, h, n) => assert(n == rawCounts.getOrElse((t, h), 0L)) }
    assert(got.map(_._3).sum == raw.length)
  }

  test("q_stream_15_rate_burst: z matches the closed form over exact minute stats; 10 rows sorted") {
    val mins = sources.Tables(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 60000000").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = mins.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val stats = counts.keys.groupBy(_._1).map { case (t, ks) =>
      val ns = ks.toSeq.map(counts)
      t -> (ks.size.toLong, ns.sum, ns.map(n => n * n).sum)
    }
    val got = Registry.byName("q_stream_15_rate_burst").fn(spark, sf).collect()
    assert(got.length == 10)
    val zs = got.map(_.getDouble(3))
    assert(zs.zip(zs.tail).forall { case (a, b) => b <= a })
    got.foreach { r =>
      val (mc, s1, s2) = stats(r.getString(0))
      val n = counts((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n)
      val den = mc.toDouble * s2.toDouble - s1.toDouble * s1.toDouble
      val z = if (den > 0)
        math.floor((mc.toDouble * n - s1.toDouble) / math.sqrt(den) * 1000000 + 0.5) / 1000000
      else 0.0
      assert(r.getDouble(3) == z)
    }
  }

  test("q_dedup_11_ensemble: contingency partitions the corpus; exact implies near on this fixture") {
    val got = Registry.byName("q_dedup_11_ensemble").fn(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got.values.sum == docs.length)
    // fixture text is lower-cased and trimmed, so an exact dup's token
    // set is identical too: the (exact=1, near=0) cell must be empty
    assert(!got.contains((1, 0)))
    // replicate both keys
    val ek = docs.groupBy(d => d._5.trim.toLowerCase).view.mapValues(_.map(_._1).toSet).toMap
    val nk = docs.groupBy(d => d._5.split(" ").distinct.sorted.mkString(" "))
      .view.mapValues(_.map(_._1).toSet).toMap
    val expected = docs.map { d =>
      (if (ek(d._5.trim.toLowerCase).size > 1) 1 else 0,
        if (nk(d._5.split(" ").distinct.sorted.mkString(" ")).size > 1) 1 else 0)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == expected)
  }

  test("q_sim_18_label_cos: centroid cosine replicates within quantization slack") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dim = vecs.head._2.length
    def centroid(vs: Array[Array[Double]]): Array[Double] =
      (0 until dim).map(i => vs.map(_(i)).sum / vs.length).toArray
    val global = centroid(vecs.map(_._2))
    val got = Registry.byName("q_sim_18_label_cos").fn(spark, sf).collect()
    got.foreach { r =>
      val c = centroid(vecs.filter(_._1 == r.getInt(0)).map(_._2))
      val cos = (c, global).zipped.map(_ * _).sum /
        (math.sqrt(c.map(x => x * x).sum) * math.sqrt(global.map(x => x * x).sum))
      assert(math.abs(r.getDouble(1) - cos) < 2e-6)
      assert(r.getDouble(1) <= 1.0 && r.getDouble(1) >= -1.0)
    }
  }

  test("q_stat_10_kendall: concordant/discordant counts match a brute-force pair walk") {
    val days = sources.Tables(spark, sf, "events")
      .select(expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("d").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val pairs = for { i <- days.indices; j <- (i + 1) until days.length } yield (days(i)._2, days(j)._2)
    val nc = pairs.count { case (a, b) => b > a }.toLong
    val nd = pairs.count { case (a, b) => b < a }.toLong
    val row = Registry.byName("q_stat_10_kendall").fn(spark, sf).collect().head
    assert(row.getLong(0) == pairs.length && row.getLong(1) == nc && row.getLong(2) == nd)
    assert(row.getDouble(3) ==
      math.floor((nc.toDouble - nd.toDouble) / pairs.length * 1000000 + 0.5) / 1000000)
    assert(math.abs(row.getDouble(3)) <= 1.0)
  }

  test("q_graph_8_assortativity: degree-pair Pearson matches a brute-force graph walk") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byOrder = li.groupBy(_._1)
    val directed = byOrder.values.flatMap { rows =>
      // (orderkey, linenumber) is NOT unique in the fixtures — replicate
      // the join's full cross-match per (ln, ln+1), not a last-wins map
      val byLn = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSeq).toMap
      byLn.toSeq.flatMap { case (ln, srcs) =>
        byLn.getOrElse(ln + 1, Seq.empty).flatMap(dst =>
          srcs.filter(_ != dst).map(src => (src, dst)))
      }
    }.toSet
    val sym = directed ++ directed.map { case (a, b) => (b, a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = sym.toSeq.map { case (a, b) => (deg(a), deg(b)) }
    val n = xs.length.toLong
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum; val syy = xs.map(p => p._2 * p._2).sum
    val row = Registry.byName("q_graph_8_assortativity").fn(spark, sf).collect().head
    assert(row.getLong(0) == n)
    val vx = n.toDouble * sxx - sx.toDouble * sx
    val vy = n.toDouble * syy - sy.toDouble * sy
    val r = if (vx * vy > 0)
      math.floor((n.toDouble * sxy - sx.toDouble * sy) / math.sqrt(vx * vy) * 1000000 + 0.5) / 1000000
    else 0.0
    assert(row.getDouble(1) == r, s"assortativity ${row.getDouble(1)} != $r")
    assert(math.abs(row.getDouble(1)) <= 1.0)
  }

  test("q_pipe_1_curation: the composed chain equals stage-by-stage brute force") {
    val base = docs.filter(_._4 >= 100)
    val afterExact = base.groupBy(d => d._5.trim.toLowerCase)
      .values.map(_.minBy(_._1)).toSeq
    val afterNear = afterExact.groupBy(d => d._5.split(" ").distinct.sorted.mkString(" "))
      .values.map(_.minBy(_._1)).toSeq
    def splitOf(id: Long): String = {
      val b = ((id % 1000000007L) * 2654435761L) % 1000000007L % 100
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    val expected = afterNear.groupBy(d => (splitOf(d._1), d._3)).map { case (k, ds) =>
      k -> (ds.size.toLong, ds.map(_._5.split(" ").length.toLong).sum)
    }
    val got = Registry.byName("q_pipe_1_curation").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, tok) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n && r.getLong(3) == tok,
        s"(${r.getString(0)}, ${r.getString(1)}): (${r.getLong(2)}, ${r.getLong(3)}) != ($n, $tok)")
    }
    // non-vacuousness: the filter stage must drop rows at this sf (the
    // dedup stages drop nothing at sf0.001 — every duplicate is short —
    // but DO drop at sf0.01, where the oracle gate pins them)
    assert(base.length < docs.length, "length filter dropped nothing")
    assert(afterNear.length <= afterExact.length && afterExact.length <= base.length)
  }

  test("plan contracts: single corpus scan; stat/spine tables broadcast") {
    def plan(q: String): String =
      Registry.byName(q).fn(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    def scans(q: String): Int =
      "(?m)^\\(\\d+\\) Scan parquet".r.findAllIn(plan(q)).length
    assert(scans("q_ret_1_ndcg") == 1)
    assert(scans("q_ret_2_mrr") == 1)
    assert(scans("q_ret_3_pr_at_k") == 1)
    assert(scans("q_ret_4_map") == 1)
    assert(scans("q_ml_1_kfold") == 1)
    assert(scans("q_text_29_source_caps") == 1)
    assert(scans("q_text_30_hapax") == 1)
    assert(scans("q_text_31_top_tokens") == 1)
    assert(scans("q_stream_15_rate_burst") == 1)
    assert(scans("q_dedup_11_ensemble") == 1)
    assert(scans("q_pipe_1_curation") == 1)
    assert(!plan("q_stream_15_rate_burst").contains("SortMergeJoin"))
    val winsor = plan("q_agg_32_winsorize")
    assert(winsor.contains("BroadcastHashJoin"), "percentile boundary table must broadcast")
    // resample: the spine-bounds and type-list branches roll up from the
    // (type,hour) aggregate; Catalyst then collapses each through the agg
    // and COLUMN-PRUNES its scan (types branch reads only event_type,
    // bounds branch only ts) — three scans in the text, but the auxiliary
    // two are single-column parquet reads, so the dominant full-width
    // pass over (ts, event_type) happens exactly once.
    val resample = plan("q_time_7_resample")
    assert(scans("q_time_7_resample") <= 3)
    assert(resample.contains("ReadSchema: struct<event_type:string>"),
      "type-list branch must prune to the event_type column alone")
    assert(resample.contains("ReadSchema: struct<ts:"),
      "bounds branch must prune to the ts column alone")
  }
}
