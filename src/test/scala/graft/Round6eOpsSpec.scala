package graft

import org.apache.spark.sql.functions._

/** Round-6 wave-3 operators: brute-force replications over the
  * collected sf0.001 fixtures.
  */
class Round6eOpsSpec extends SparkSpec {

  test("q_join_22_null_isolate: equals the naive left join's aggregate") {
    val got = Registry.byName("q_join_22_null_isolate").fn(spark, sf).collect().head
    val o = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"),
        when(col("o_custkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("k"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val c = graft.sources.Tables(spark, sf, "customer").select("c_custkey")
    val naive = o.join(c, col("k") === col("c_custkey"), "left_outer")
      .agg(count(lit(1)), sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)),
        sum(when(col("k").isNull, 1L).otherwise(0L)))
      .collect().head
    assert(got.getLong(0) == naive.getLong(0))
    assert(got.getLong(1) == naive.getLong(1))
    assert(got.getLong(2) == naive.getLong(2))
    assert(got.getLong(1) + got.getLong(2) <= got.getLong(0))
  }

  test("q_stat_32_median_ci: rank picks replicate; lo <= median <= hi") {
    val cents = graft.sources.Tables(spark, sf, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    val n = cents.length.toLong
    val rLo = math.floor((n - 1.96 * math.sqrt(n.toDouble)) / 2).toLong
    val rHi = math.ceil((n + 1.96 * math.sqrt(n.toDouble)) / 2).toLong
    val rMed = (n + 1) / 2
    def pick(r: Long) = math.floor(cents((r - 1).toInt)._1.toDouble / 100 * 100 + 0.5) / 100
    val got = Registry.byName("q_stat_32_median_ci").fn(spark, sf).collect().head
    assert(got.getLong(0) == n)
    assert(got.getDouble(1) == pick(rLo))
    assert(got.getDouble(2) == pick(rMed))
    assert(got.getDouble(3) == pick(rHi))
    assert(got.getDouble(1) <= got.getDouble(2) && got.getDouble(2) <= got.getDouble(3))
  }

  test("q_stream_36_dwell: the top transition pair's stats replicate") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._4))
      s.sliding(2).filter(_.length == 2).map(w =>
        (s"${w(0)._3}>${w(1)._3}", w(1)._2 - w(0)._2))
    }.toSeq
    val byStep = gaps.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = Registry.byName("q_stream_36_dwell").fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val top = rows.head
    val g = byStep(top.getString(0))
    assert(top.getLong(1) == g.length.toLong)
    assert(top.getDouble(2) ==
      math.floor(g.sum.toDouble / g.length / 1000000 * 1000 + 0.5) / 1000)
    assert(top.getLong(3) == g.max / 1000000L)
  }

  test("q_graph_17_neighbor_degree: paradox share replicates on the sampled graph") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val edges = li.groupBy(_._1).values.flatMap { ls =>
      val m: Map[Int, Seq[Long]] =
        ls.groupBy(_._2).view.mapValues(_.map(_._3).toSeq).toMap
      m.toSeq.flatMap { case (ln, s1s) =>
        m.getOrElse(ln + 1, Seq.empty[Long])
          .flatMap(s2 => s1s.filter(_ != s2).map(s1 => (s1, s2)))
      }
    }.toSet
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val paradox = adj.count { case (v, ns) =>
      ns.toSeq.map(adj(_).size.toLong).sum > ns.size.toLong * adj(v).size
    }
    val got = Registry.byName("q_graph_17_neighbor_degree").fn(spark, sf).collect().head
    assert(got.getLong(0) == adj.size.toLong)
    assert(got.getDouble(3) ==
      math.floor(paradox.toDouble / adj.size * 1000000 + 0.5) / 1000000)
  }

  test("q_dedup_27_method_overlap: exact dups are a subset of prefix dups") {
    val r = Registry.byName("q_dedup_27_method_overlap").fn(spark, sf).collect().head
    assert(r.getLong(3) == 0L, "exact-only must be empty (same text => same prefix)")
    assert(r.getLong(2) == r.getLong(0))
    assert(r.getLong(1) >= r.getLong(0))
    val texts = graft.sources.Tables(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val nExact = texts.groupBy(identity).values.filter(_.length >= 2).map(_.length).sum
    assert(r.getLong(0) == nExact.toLong)
  }

  test("q_time_22_wma: one full-window day replicates; flag matches the LCM compare") {
    val daily = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val rows = Registry.byName("q_time_22_wma").fn(spark, sf).collect()
    assert(rows.length == math.max(0, daily.length - 6))
    if (rows.nonEmpty) {
      val last = rows.last
      val idx = daily.indexWhere(_._1 == last.getLong(0))
      val w7 = daily.slice(idx - 6, idx + 1).map(_._2) // oldest..newest
      val wmaNum = w7.reverse.zipWithIndex.map { case (c, i) => (7 - i).toLong * c }.sum
      val smaNum = w7.sum
      assert(last.getDouble(1) == math.floor(wmaNum / 28.0 / 100 * 100 + 0.5) / 100)
      assert(last.getDouble(2) == math.floor(smaNum / 7.0 / 100 * 100 + 0.5) / 100)
      assert(last.getLong(3) == (if (wmaNum * 7 > smaNum * 28) 1L else 0L))
    }
  }

  test("q_sink_4_compaction: rows conserved through both rewrites; temp dir cleaned") {
    val r = Registry.byName("q_sink_4_compaction").fn(spark, sf).collect().head
    val n = graft.sources.Tables(spark, sf, "orders").count()
    assert(r.getLong(0) == n && r.getLong(1) == n)
    val base = s"${sys.props("java.io.tmpdir")}/graft_compact_${spark.sparkContext.applicationId}"
    assert(!new java.io.File(base).exists(), "compaction temp dir must be cleaned up")
  }

  test("q_ml_11_cv_stump: per-fold train argmax and held-out accuracy replicate") {
    val P = 1000000007L
    val ev = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select("event_id", "value", "event_type").collect()
      .map(r => (((r.getLong(0) % P + P) % P * 2654435761L) % P % 5,
        r.getDouble(1), r.getString(2) == "purchase"))
    val grid = (1 to 19).map(_ * 10L)
    val cells = (for (f <- 0L to 4L; t <- grid) yield {
      val rows = ev.filter(_._1 == f)
      val ok = rows.count(e => (e._2 > t) == e._3).toLong
      ((f, t), (rows.length.toLong, ok))
    }).toMap
    val got = Registry.byName("q_ml_11_cv_stump").fn(spark, sf).collect()
    got.foreach { r =>
      val f = r.getLong(0)
      val best = grid.map { t =>
        val tot = (0L to 4L).map(ff => cells((ff, t))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
        val (fn, fok) = cells((f, t))
        val tracc6 = math.floor((tot._2 - fok).toDouble / (tot._1 - fn) * 1000000 + 0.5).toLong
        (t, tracc6)
      }.maxBy { case (t, a) => (a, -t) }
      assert(r.getLong(1) == best._1, s"fold $f threshold")
      val (fn, fok) = cells((f, best._1))
      assert(r.getDouble(3) ==
        math.floor(fok.toDouble / fn * 1000000 + 0.5).toLong / 1000000.0, s"fold $f test acc")
    }
  }
}
