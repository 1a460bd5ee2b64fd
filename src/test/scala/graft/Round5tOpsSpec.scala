package graft

import org.apache.spark.sql.functions._

/** Round-5t operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5tOpsSpec extends SparkSpec {

  private lazy val docs =
    graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  test("q_dedup_19_containment: directional scores replicate; containment >= jaccard always") {
    val toks = docs.filter(_._1 < 40).map(d => d._1 -> d._2.split(" ").toSet).toMap
    val expected = (for {
      (a, ta) <- toks; (b, tb) <- toks if a != b
      c = (ta & tb).size.toLong if c > 0
      cont6 = math.floor(c.toDouble / ta.size * 1e6 + 0.5).toLong if cont6 >= 500000
    } yield (a, b, cont6 / 1e6,
      math.floor(c.toDouble / (ta.size + tb.size - c) * 1e6 + 0.5) / 1e6))
      .toSeq.sortBy(t => (-t._3, t._1, t._2)).take(20)
    val got = Registry.byName("q_dedup_19_containment").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == expected)
    got.foreach(r => assert(r._3 >= r._4, s"containment < jaccard for ${r._1}->${r._2}"))
  }

  test("q_dedup_20_soft_weight: effective <= raw; equality iff no duplicate text in source") {
    val rows = Registry.byName("q_dedup_20_soft_weight").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val k = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = docs.groupBy(_._4).view.mapValues { ds =>
      val w6 = ds.map(d => 1000000L / k(d._2)).sum
      (ds.size.toLong,
        math.floor(w6.toDouble / 1e6 * 1e4 + 0.5) / 1e4,
        math.floor(w6.toDouble / ds.size / 1e6 * 1e4 + 0.5) / 1e4)
    }.toMap
    rows.foreach { case (src, raw, eff, ret) =>
      val (er, ee, ert) = expected(src)
      assert(raw == er && eff == ee && ret == ert, s"source $src")
      assert(eff <= raw + 1e-9)
    }
  }

  test("q_text_45_stopword_share: shares replicate the data-derived top-10 membership") {
    val toks = docs.flatMap(d => d._2.split(" ").map(t => (d._3, t)))
    val top10 = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    val expected = toks.groupBy(_._1).view.mapValues { ts =>
      val n = ts.size.toLong; val st = ts.count(t => top10(t._2)).toLong
      (n, st, math.floor(st.toDouble / n * 1e6 + 0.5) / 1e6)
    }.toMap
    val got = Registry.byName("q_text_45_stopword_share").fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expected)
  }

  test("q_dedup_21_shingle_size: mean jaccard decreases with k (longer shingles discriminate)") {
    val rows = Registry.byName("q_dedup_21_shingle_size").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // all k share the same pair count (every unordered pair of the 30 docs)
    assert(rows.map(_._2).distinct.length == 1)
    val nDocs = docs.count(_._1 < 30).toLong
    assert(rows.head._2 == nDocs * (nDocs - 1) / 2)
    // discrimination: unigram overlap >= bigram >= trigram on average
    assert(rows(0)._3 >= rows(1)._3 && rows(1)._3 >= rows(2)._3)
  }

  test("q_mm_9_dft_bin: integer dot products replicate; magnitude positive") {
    val cosTab = for (k <- 1 to 4; n <- 0 until 64)
      yield math.floor(math.cos(2 * math.Pi * n * k / 64) * 1e6 + 0.5).toLong
    val sinTab = for (k <- 1 to 4; n <- 0 until 64)
      yield math.floor(math.sin(2 * math.Pi * n * k / 64) * 1e6 + 0.5).toLong
    val expected = docs.filter(_._1 < 50).map { d =>
      val samples = (0 until 64).map(n => (d._2.charAt(n % d._2.length).toLong - 128))
      val mags = (1 to 4).map { k =>
        val sc = samples.zipWithIndex.map { case (s, n) => s * cosTab((k - 1) * 64 + n) }.sum
        val ss = samples.zipWithIndex.map { case (s, n) => s * sinTab((k - 1) * 64 + n) }.sum
        (k.toLong, sc * sc + ss * ss)
      }
      val best = mags.sortBy(m => (-m._2, m._1)).head
      (d._1, best._1, math.floor(math.sqrt(best._2.toDouble) / 1e6 * 100 + 0.5) / 100)
    }.sortBy(_._1)
    val got = Registry.byName("q_mm_9_dft_bin").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
    assert(got.forall(_._3 >= 0))
  }
}
