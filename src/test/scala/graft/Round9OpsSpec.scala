package graft

import org.apache.spark.sql.functions._

/** Round-9 queries replicated against independent driver-side scala
  * computations on the sf0.001 fixture (house style: the oracle gate
  * checks DuckDB agreement; these pins check the MATH).
  */
class Round9OpsSpec extends SparkSpec {

  private def rnd(x: Double, p: Int): Double = {
    val m = math.pow(10, p); math.floor(x * m + 0.5) / m
  }

  test("q_graph_26_hop_profile: histogram equals a driver-side BFS over the same edges") {
    val edges = graft.sources.SampledEdges.handoff(spark, sf, 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    val root = nodes.min
    // textbook queue BFS
    val dist = scala.collection.mutable.Map(root -> 0L)
    val q = scala.collection.mutable.Queue(root)
    while (q.nonEmpty) {
      val u = q.dequeue()
      adj.getOrElse(u, Set.empty).foreach { v =>
        if (!dist.contains(v)) { dist(v) = dist(u) + 1; q.enqueue(v) }
      }
    }
    val hist = dist.values.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val tot = hist.values.sum.toDouble
    val got = Registry.byName("q_graph_26_hop_profile").fn(spark, sf).collect()
    assert(got.length == hist.size)
    var cum = 0L
    got.sortBy(_.getLong(0)).foreach { r =>
      val d = r.getLong(0)
      cum += hist(d)
      assert(r.getLong(1) == hist(d), s"n_nodes at hop $d")
      assert(r.getDouble(2) == rnd(hist(d) / tot, 6), s"share at hop $d")
      assert(r.getDouble(3) == rnd(cum / tot, 6), s"cum_share at hop $d")
    }
    assert(got.map(_.getDouble(3)).max == 1.0) // profile is complete
  }

  test("q_join_26_band_tuning: candidates/survivors equal a driver-side pair count") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-05-25").cast("timestamp")
        && col("l_shipdate") < lit("1996-06-08").cast("timestamp")
        && col("l_orderkey") % 3 === 0)
      .select(unix_micros(col("l_shipdate").cast("timestamp")),
        unix_micros(date_trunc("month", col("l_shipdate"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val o = graft.sources.Tables(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1996-03-01").cast("timestamp")
        && col("o_orderdate") <= lit("1996-06-08").cast("timestamp"))
      .select(unix_micros(col("o_orderdate").cast("timestamp")),
        unix_micros((col("o_orderdate") + expr("INTERVAL 90 DAY")).cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // per lineitem band: candidates = orders whose month span covers it
    val monthsOf = o.map { case (od, vu) =>
      // enumerate month starts between trunc(od) and trunc(vu) via the
      // engine itself would be circular; a coarse superset check
      // suffices: the order is a candidate in band b iff
      // trunc(od) <= b <= trunc(vu)
      (od, vu)
    }
    val byBand = li.groupBy(_._2)
    val got = Registry.byName("q_join_26_band_tuning").fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val bandUs = r.getTimestamp(0).getTime * 1000L
      val band = java.time.Instant.ofEpochMilli(r.getTimestamp(0).getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      val lis = byBand(bandUs)
      val cands = monthsOf.filter { case (od, vu) =>
        // month-trunc in µs: od's month start <= band <= vu's month start
        firstOfMonthUs(od) <= bandUs && bandUs <= firstOfMonthUs(vu)
      }
      val nCand = lis.length.toLong * cands.length
      val nPairs = lis.iterator.map { case (ship, _) =>
        cands.count { case (od, vu) => ship >= od && ship <= vu }.toLong
      }.sum
      assert(r.getLong(1) == nCand, s"candidates at $band")
      assert(r.getLong(2) == nPairs, s"pairs at $band")
      assert(r.getDouble(3) == rnd(nPairs.toDouble / nCand, 6), s"survival at $band")
      assert(nPairs <= nCand && nPairs > 0)
    }
  }

  private def firstOfMonthUs(us: Long): Long = {
    val d = java.time.Instant.ofEpochMilli(us / 1000L)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.withDayOfMonth(1)
    java.time.ZonedDateTime.of(d.atStartOfDay(), java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000L
  }

  test("q_pipe_13_dedup_savings: per-lang totals equal a driver-side dedup") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keyed = docs.map { case (id, lang, text) =>
      (id, lang, text.trim.toLowerCase, text.split(" ", -1).length.toLong)
    }
    val winners = keyed.groupBy(_._3).map { case (k, xs) => k -> xs.map(_._1).min }
    val got = Registry.byName("q_pipe_13_dedup_savings").fn(spark, sf).collect()
    assert(got.nonEmpty)
    val gotLangs = got.map(_.getString(0)).toSet
    assert(gotLangs == keyed.map(_._2).toSet)
    got.foreach { r =>
      val lang = r.getString(0)
      val mine = keyed.filter(_._2 == lang)
      val nDocs = mine.length.toLong
      val nToks = mine.map(_._4).sum
      val kept = mine.filter(x => winners(x._3) == x._1)
      val nKept = kept.length.toLong
      val tKept = kept.map(_._4).sum
      assert(r.getLong(1) == nDocs, s"n_docs $lang")
      assert(r.getLong(2) == nToks, s"n_tokens $lang")
      assert(r.getLong(3) == nKept, s"n_docs_kept $lang")
      assert(r.getLong(4) == tKept, s"n_tokens_kept $lang")
      assert(r.getDouble(5) == rnd(1.0 - tKept.toDouble / nToks, 6), s"savings $lang")
    }
  }
}
