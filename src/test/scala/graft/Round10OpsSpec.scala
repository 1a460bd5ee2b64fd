package graft

import org.apache.spark.sql.functions._

/** Round-10 queries replicated against independent driver-side scala
  * computations on the sf0.001 fixture (house style: the oracle gate
  * checks DuckDB agreement; these pins check the MATH).
  */
class Round10OpsSpec extends SparkSpec {

  private def delNeighborhood(name: String): Seq[String] =
    name +: name.indices.map(i => name.substring(0, i) + name.substring(i + 1))

  test("q_dedup_32_deletion_blocks: histogram equals a driver-side signature fold") {
    val names = graft.sources.Tables(spark, sf, "customer")
      .select("c_name").collect().map(_.getString(0))
    val blockSizes = names.flatMap(delNeighborhood)
      .groupBy(identity).map(_._2.length.toLong)
    val hist = blockSizes.groupBy(identity).map { case (bs, xs) =>
      bs -> (xs.size.toLong, xs.size.toLong * (bs * (bs - 1) / 2))
    }
    val got = Registry.byName("q_dedup_32_deletion_blocks").fn(spark, sf).collect()
    assert(got.length == hist.size)
    got.foreach { r =>
      val (nBlocks, nPairs) = hist(r.getLong(0))
      assert(r.getLong(1) == nBlocks, s"n_blocks at size ${r.getLong(0)}")
      assert(r.getLong(2) == nPairs, s"n_pairs at size ${r.getLong(0)}")
    }
  }

  test("deletion signatures cover every Levenshtein<=1 name pair (the q_dedup_9 guarantee)") {
    // the property the blocking scheme stands on: dist<=1 => shared key
    val names = graft.sources.Tables(spark, sf, "customer")
      .select("c_name").collect().map(_.getString(0)).take(60)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (a <- names; b <- names if a < b && lev(a, b) <= 1) {
      val sa = delNeighborhood(a).toSet
      val sb = delNeighborhood(b).toSet
      assert(sa.intersect(sb).nonEmpty, s"no shared deletion signature for '$a' / '$b'")
    }
  }

  test("q_mm_14_phash_bands: nested bands make candidates monotone; counts match a driver fold") {
    val rows = Registry.byName("q_mm_14_phash_bands").fn(spark, sf).collect()
    assert(rows.length == 3)
    // nb=16 bands are halves of nb=8 bands are halves of nb=4 bands:
    // a shared wide band implies shared narrow halves, so candidate
    // sets are supersets down the sweep and recall never drops
    val cands = rows.map(_.getLong(2))
    val vers = rows.map(_.getLong(3))
    assert(cands(0) <= cands(1) && cands(1) <= cands(2), "candidates monotone in n_bands")
    assert(vers(0) <= vers(1) && vers(1) <= vers(2), "verified monotone in n_bands")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(4), "verified <= true pairs"))
    // driver-side recomputation from the decoded hashes
    import spark.implicits._
    val h = graft.sources.Tables(spark, sf, "documents")
      .filter(col("doc_id") < 100 && length(col("text")) > 0)
      .select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, t) => graft.operators.Round3cOps.phashOf(id, t) }
    type PH = graft.operators.Round3cOps.PHashRow
    def dist(a: PH, b: PH): Int =
      java.lang.Long.bitCount(a.ph_lo ^ b.ph_lo) + java.lang.Long.bitCount(a.ph_hi ^ b.ph_hi)
    val pairs = for (a <- h; b <- h if a.doc_id < b.doc_id) yield (a, b)
    val nTrue = pairs.count { case (a, b) => dist(a, b) <= 18 }
    def bandsOf(x: PH, nb: Int): Seq[(Int, Long)] = {
      val w = 64 / nb
      (0 until nb).map { i =>
        val src = if (i * w < 32) x.ph_lo else x.ph_hi
        (i, (src >> ((i * w) % 32)) & ((1L << w) - 1))
      }
    }
    Seq(4, 8, 16).zipWithIndex.foreach { case (nb, k) =>
      val cand = pairs.filter { case (a, b) =>
        bandsOf(a, nb).zip(bandsOf(b, nb)).exists { case (x, y) => x == y }
      }
      assert(rows(k).getLong(2) == cand.length.toLong, s"n_candidates at nb=$nb")
      assert(rows(k).getLong(3) == cand.count { case (a, b) => dist(a, b) <= 18 }.toLong,
        s"n_verified at nb=$nb")
      assert(rows(k).getLong(4) == nTrue.toLong)
    }
  }

  test("q_stream_43_conc_profile: level durations equal a driver-side sweep over the session table") {
    val sess = graft.sources.Tables(spark, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(unix_micros(min("ts")).as("st"), unix_micros(max("ts")).as("en"))
      .select("st", "en").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deltas = sess.flatMap { case (st, en) => Seq(st -> 1L, (en + 1) -> -1L) }
      .groupBy(_._1).map { case (t, ds) => t -> ds.map(_._2).sum }
      .toSeq.sortBy(_._1)
    var conc = 0L
    val durs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    deltas.sliding(2).foreach {
      case Seq((t, d), (tn, _)) => conc += d; durs(conc) += tn - t
      case _ => ()
    }
    val total = durs.values.sum.toDouble
    val got = Registry.byName("q_stream_43_conc_profile").fn(spark, sf).collect()
    assert(got.length == durs.size)
    var shareSum = 0.0
    got.foreach { r =>
      assert(r.getLong(1) == durs(r.getLong(0)), s"total_us at level ${r.getLong(0)}")
      assert(r.getDouble(2) ==
        math.floor(durs(r.getLong(0)) / total * 1000000 + 0.5) / 1000000)
      shareSum += r.getDouble(2)
    }
    assert(math.abs(shareSum - 1.0) < 1e-4, "shares sum to ~1")
  }
}
