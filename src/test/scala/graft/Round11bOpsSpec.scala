package graft

import org.apache.spark.sql.functions._

/** Round-11 continuation queries replicated against independent
  * driver-side scala computations on the sf0.001 fixture.
  */
class Round11bOpsSpec extends SparkSpec {

  private val P = 1000000007L
  private def charHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % P)
  private def minhash16(text: String): Seq[Long] = {
    val hs = text.split(" ", -1).distinct.map(charHash)
    (0L until 16L).map(i => hs.map(h => (h * (i * 2 + 3) + (i * 5 + 7)) % P).min)
  }

  private lazy val docs: Array[(Long, String)] =
    graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  test("q_pipe_14_dedup_cascade: funnel equals a driver-side staged fold") {
    def toks(t: String) = t.split(" ", -1).length.toLong
    def k1(t: String) = t.trim.toLowerCase
    def k2(t: String) = t.trim.toLowerCase.split(" ", -1).distinct.sorted.mkString(" ")
    def k3(t: String) = minhash16(t).mkString("-")
    def keepMin(xs: Seq[(Long, String)], key: String => String): Seq[(Long, String)] = {
      val keep = xs.groupBy(x => key(x._2)).values.map(_.map(_._1).min).toSet
      xs.filter(x => keep(x._1))
    }
    val s1 = keepMin(docs.toSeq, k1)
    val s2 = keepMin(s1, k2)
    val s3 = keepMin(s2, k3)
    val tt = docs.map(d => toks(d._2)).sum
    val exp = Seq("a_exact" -> s1, "b_tokenset" -> s2, "c_minhash" -> s3).map {
      case (n, xs) => (n, xs.size.toLong, xs.map(x => toks(x._2)).sum)
    }
    val got = Registry.byName("q_pipe_14_dedup_cascade").fn(spark, sf).collect()
    assert(got.length == 3)
    got.zip(exp).foreach { case (r, (n, nd, nt)) =>
      assert(r.getString(0) == n)
      assert(r.getLong(1) == docs.length.toLong, "n_docs_in")
      assert(r.getLong(2) == nd, s"n_docs_kept at $n")
      assert(r.getLong(3) == nt, s"n_tokens_kept at $n")
      assert(r.getDouble(4) ==
        math.floor((1 - nt.toDouble / tt) * 1000000 + 0.5) / 1000000, s"share at $n")
    }
    // the funnel is monotone: each stage can only remove
    assert(exp(0)._2 >= exp(1)._2 && exp(1)._2 >= exp(2)._2)
  }

  test("q_text_59_ttr_curve: deciles and TTR equal a driver-side rank fold") {
    val stats = docs.map { case (id, t) =>
      val tk = t.split(" ", -1)
      (id, tk.length.toLong, tk.distinct.length.toLong)
    }.sortBy(x => (x._2, x._1))
    val n = stats.length
    // SQL ntile(10): first (n mod 10) buckets get ceil(n/10)
    val base = n / 10; val extra = n % 10
    val expected = stats.zipWithIndex.map { case ((_, toks, typs), i) =>
      val big = (base + 1) * extra
      val dec = if (i < big) i / (base + 1) + 1 else (i - big) / base + extra + 1
      (dec.toLong, toks, typs)
    }.groupBy(_._1).map { case (dec, xs) =>
      dec -> (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
    }
    val got = Registry.byName("q_text_59_ttr_curve").fn(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nd, nt, ny) = expected(r.getLong(0))
      assert(r.getLong(1) == nd && r.getLong(2) == nt && r.getLong(3) == ny,
        s"decile ${r.getLong(0)}")
      assert(r.getDouble(4) == math.floor(ny.toDouble / nt * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_sim_45_dim_spectrum: variances equal a driver-side quantized fold") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dims = emb.head.length
    val exp = (0 until dims).map { d =>
      val vq = emb.map(e => math.floor(e(d).toDouble * 10000 + 0.5).toLong)
      val n = vq.length.toLong
      val s = vq.sum; val sq = vq.map(v => v * v).sum
      val var6 = math.floor((n.toDouble * sq - s.toDouble * s)
        / (n.toDouble * n) / 100000000L * 1000000L + 0.5).toLong
      (d.toLong, n, var6)
    }
    val tv = exp.map(_._3).sum
    val got = Registry.byName("q_sim_45_dim_spectrum").fn(spark, sf).collect()
    assert(got.length == dims)
    got.zip(exp).foreach { case (r, (d, n, var6)) =>
      assert(r.getLong(0) == d && r.getLong(1) == n)
      assert(r.getDouble(2) == var6.toDouble / 1000000L, s"variance at dim $d")
      assert(r.getDouble(3) ==
        math.floor(var6.toDouble / tv * 1000000 + 0.5) / 1000000, s"share at dim $d")
    }
    // a healthy spectrum: total variance positive, no dimension negative
    assert(tv > 0 && exp.forall(_._3 >= 0))
  }
}
