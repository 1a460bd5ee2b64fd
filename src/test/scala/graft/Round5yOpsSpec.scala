package graft

import org.apache.spark.sql.functions._

/** Round-5y operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5yOpsSpec extends SparkSpec {

  private lazy val embeddings =
    graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))

  private def cos6(a: Array[Double], b: Array[Double]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong
  }

  test("q_sim_29_triplet: per-anchor best pos/neg replicate") {
    val probes = embeddings.filter(_._1 < 60)
    val margins = probes.map { p =>
      val others = embeddings.filter(_._1 != p._1)
      val pos = others.filter(_._2 == p._2).map(o => cos6(p._3, o._3)).max
      val neg = others.filter(_._2 != p._2).map(o => cos6(p._3, o._3)).max
      (pos, neg)
    }
    val nSat = margins.count { case (p, n) => p > n }.toLong
    val row = Registry.byName("q_sim_29_triplet").fn(spark, sf).collect().head
    assert(row.getLong(0) == probes.length.toLong)
    assert(row.getLong(1) == nSat)
    assert(row.getDouble(2) == math.floor(nSat.toDouble / probes.length * 1e4 + 0.5) / 1e4)
    val meanM = margins.map { case (p, n) => p - n }.sum
    assert(row.getDouble(3) ==
      math.floor(meanM.toDouble / probes.length / 1e6 * 1e6 + 0.5) / 1e6)
  }

  test("q_sim_30_norms: quantized norms replicate; min <= mean <= max") {
    val n6 = embeddings.map { e =>
      val s = e._3.map(x => {
        val c = math.floor(x * 1e6 + 0.5); c * c
      }).sum
      (e._2.toLong, math.floor(math.sqrt(s) / 1e6 * 1e6 + 0.5).toLong)
    }
    val expected = n6.groupBy(_._1).view.mapValues { ns =>
      val vals = ns.map(_._2)
      (ns.length.toLong,
        math.floor(vals.sum.toDouble / ns.length / 1e6 * 1e4 + 0.5) / 1e4,
        math.floor(vals.min.toDouble / 1e6 * 1e4 + 0.5) / 1e4,
        math.floor(vals.max.toDouble / 1e6 * 1e4 + 0.5) / 1e4)
    }.toMap
    val got = Registry.byName("q_sim_30_norms").fn(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected)
    got.values.foreach { case (_, mean, mn, mx) => assert(mn <= mean + 1e-9 && mean <= mx + 1e-9) }
  }

  test("q_dedup_22_cluster_sizes: histogram conserves the corpus; shares sum to 1") {
    val rows = Registry.byName("q_dedup_22_cluster_sizes").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = graft.sources.Tables(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == total)
    rows.foreach { case (k, nc, nd, _) => assert(nd == k * nc) }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
  }

  test("q_text_48_vocab_overlap: pair jaccard replicates; all 10 pairs present") {
    val vocab = graft.sources.Tables(spark, sf, "documents")
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Registry.byName("q_text_48_vocab_overlap").fn(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val langs = vocab.keys.toSeq.sorted
    val pairs = for (i <- langs.indices; j <- i + 1 until langs.length) yield (langs(i), langs(j))
    assert(got.keySet == pairs.toSet)
    pairs.foreach { case (a, b) =>
      val (na, nb, c, j) = got((a, b))
      assert(na == vocab(a).size.toLong && nb == vocab(b).size.toLong)
      assert(c == (vocab(a) & vocab(b)).size.toLong)
      assert(j == math.floor(c.toDouble / (na + nb - c) * 1e6 + 0.5) / 1e6)
    }
  }
}
