package graft

/** Round-7s LLM-pipeline depth wave: brute-force replications on sf0.001. */
class Round7sOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "lang").collect()
    .map(r => (r.getLong(0), r.getString(1)))

  test("q_dedup_31_url_canonical: four variants collapse to one canonical") {
    val got = Registry.byName("q_dedup_31_url_canonical").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byPid = docs.map(_._1).groupBy(_ % 50)
    assert(got.length == byPid.size)
    got.foreach { case (pid, nUrls, nRaw, nCanon, canon) =>
      assert(nUrls == byPid(pid).length.toLong)
      val variants = byPid(pid).map(_ % 4).distinct.size.toLong
      assert(nRaw == variants, s"pid $pid raw variants")
      assert(nCanon == 1L, s"pid $pid must canonicalize to ONE url")
      assert(canon == s"https://example.com/p/$pid")
    }
  }

  test("q_pipe_12_sqrt_quota: quotas sum to exactly 100, ordered by sqrt weight") {
    val counts = docs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val w6 = counts.map { case (l, n) => (l, n, math.floor(math.sqrt(n.toDouble) * 1e6).toLong) }
    val tw = w6.map(_._3).sum
    val q0 = w6.map { case (l, n, w) => (l, n, w, 100 * w / tw, 100 * w % tw) }
    val leftover = 100 - q0.map(_._4).sum
    val bump = q0.sortBy(r => (-r._5, r._1)).take(leftover.toInt).map(_._1).toSet
    val exp = q0.map { case (l, n, w, q, _) =>
      (l, n, w, q + (if (bump(l)) 1L else 0L))
    }
    val got = Registry.byName("q_pipe_12_sqrt_quota").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
    assert(got.map(_._4).sum == 100L)
  }

  test("q_agg_46_sketch_union: exact counts replicate, every verdict inside the band") {
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exp = ord.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong)
      .toSeq.sortBy(_._1) :+ ("ALL" -> ord.map(_._2).distinct.size.toLong)
    val got = Registry.byName("q_agg_46_sketch_union").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => (g._1, g._2)).sortBy(_._1).toSeq == exp.sortBy(_._1).toSeq)
    got.foreach { case (pr, _, ok) => assert(ok == 1L, s"$pr estimate outside 5% band") }
  }

  test("q_sim_44_nprobe_sweep: recall ceiling is monotone and complete at nprobe=8") {
    val got = Registry.byName("q_sim_44_nprobe_sweep").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // candidates and reachable-truth both monotone in nprobe
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted)
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted)
    val n = graft.sources.Tables(spark, sf, "embeddings").count()
    val last = got.last
    assert(last._2 == n - 1, "nprobe=8 must reach every non-probe vector")
    assert(last._3 == 5L && last._4 == 1.0, "all 5 true neighbors reachable at full probe")
  }

  test("q_sim_44_nprobe_sweep: truth set matches brute-force cosine top-5") {
    // replicate the truth selection in Scala and check reachable counts at nprobe=1
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val vecs = emb.toMap
    def sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val p = vecs(0L)
    val cents = (0L to 7L).map(i => (i, vecs(i)))
    def cellOf(v: Array[Float]): Long = cents.minBy(c => (sq(v, c._2), c._1))._1
    val crank = cents.map(c => (c._1, sq(p, c._2))).sortBy(c => (c._2, c._1))
      .zipWithIndex.map { case ((cid, _), i) => (cid, i + 1) }.toMap
    val truth = emb.filter(_._1 != 0L).map(e => (e._1, cos(e._2, p)))
      .sortBy(e => (-e._2, e._1)).take(5).map(_._1).toSet
    val reach1 = emb.filter(_._1 != 0L)
      .count(e => crank(cellOf(e._2)) <= 1 && truth(e._1)).toLong
    val got = Registry.byName("q_sim_44_nprobe_sweep").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.head == ((1L, reach1)))
  }
}
