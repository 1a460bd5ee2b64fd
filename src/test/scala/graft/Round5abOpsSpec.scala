package graft

import org.apache.spark.sql.functions._

/** Round-5ab operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5abOpsSpec extends SparkSpec {

  test("q_pipe_3_mixture_rebalance: rarest language keeps 1.0; expected kept ~ min count") {
    val rows = Registry.byName("q_pipe_3_mixture_rebalance").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val minN = rows.map(_._2).min
    rows.foreach { case (lang, n, share, keep, kept) =>
      assert(keep == math.floor(minN.toDouble / n * 1e6 + 0.5) / 1e6, lang)
      assert(kept == math.floor(minN.toDouble / n * n + 0.5).toLong, lang)
      // uniformization: every language's expected kept is within 1 of min
      assert(math.abs(kept - minN) <= 1, lang)
    }
    assert(rows.exists(_._4 == 1.0))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
  }

  test("q_sim_31_farthest_seeds: greedy farthest-point traversal replicates") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def d6(a: Array[Double], b: Array[Double]): Long = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.floor(s * 1e6 + 0.5).toLong
    }
    val e0 = emb.find(_._1 == 0L).get._2
    val d1 = emb.map(e => (e._1, d6(e._2, e0)))
    val seed2 = d1.maxBy(t => (t._2, -t._1))._1
    val e2 = emb.find(_._1 == seed2).get._2
    val d12 = emb.map(e => (e._1, math.min(d6(e._2, e0), d6(e._2, e2))))
    val seed3 = d12.maxBy(t => (t._2, -t._1))._1
    val e3 = emb.find(_._1 == seed3).get._2
    val cov = emb.map(e => Seq(d6(e._2, e0), d6(e._2, e2), d6(e._2, e3)).min).max
    val row = Registry.byName("q_sim_31_farthest_seeds").fn(spark, sf).collect().head
    assert(row.getLong(0) == 0L)
    assert(row.getLong(1) == seed2)
    assert(row.getLong(2) == seed3)
    assert(row.getDouble(3) == math.floor(math.sqrt(cov / 1e6) * 1e4 + 0.5) / 1e4)
  }

  test("q_dq_32_benford2: observed shares sum to 1 and expected law is a distribution") {
    val rows = Registry.byName("q_dq_32_benford2").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet.subsetOf((0L to 9L).toSet))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // the second-digit law is monotone decreasing in the digit
    val law = rows.sortBy(_._1).map(_._4)
    assert(law.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // full law mass (all 10 digits) is 1; present digits bound it
    assert(law.sum <= 1.0 + 1e-4)
  }

  test("q_stream_31_abandonment: per-weekday counts replicate") {
    val events = graft.sources.Tables(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lastClick = events.filter(_._2 == "click").groupBy(_._1).view.mapValues(_.map(_._3).max)
    val expected = lastClick.toSeq.map { case (u, cus) =>
      val converted = events.exists(e => e._1 == u && e._2 == "purchase"
        && e._3 > cus && e._3 <= cus + 86400000000L)
      ((cus / 86400000000L) % 7, if (converted) 0L else 1L)
    }.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._2).sum)
    }.toMap
    val got = Registry.byName("q_stream_31_abandonment").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }
}
