package graft

import org.apache.spark.sql.functions._

/** Round-6 corpus-economics operators: brute-force replications on
  * sf0.001.
  */
class Round6jOpsSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String, String)] =
    graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("q_text_52_truncation: per-cap token losses replicate; loss share shrinks with cap") {
    val toks = docs.map(_._3.split(" ").length.toLong)
    val total = toks.sum
    val got = Registry.byName("q_text_52_truncation").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(16L, 32L, 64L))
    got.foreach { case (cap, tt, lost, nd, share) =>
      assert(tt == total, s"cap $cap total")
      assert(lost == toks.map(t => math.max(0L, t - cap)).sum, s"cap $cap lost")
      assert(nd == toks.count(_ > cap).toLong, s"cap $cap docs")
      assert(math.abs(share - math.floor(lost.toDouble / total * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q_text_53_acquisition_curve: novelty attribution and cumulative sum replicate") {
    val srcOrd = (s: String) => s.drop(3).toLong
    val firstOf = docs.groupBy(_._3).view.mapValues(_.map(d => srcOrd(d._2)).min).toMap
    val novel = firstOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val allSrcs = docs.map(d => srcOrd(d._2)).distinct.sorted
    var cum = 0L
    val expected = allSrcs.map { o =>
      val n = novel.getOrElse(o, 0L); cum += n; (o, n, cum)
    }
    val got = Registry.byName("q_text_53_acquisition_curve").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // final cumulative = number of distinct texts in the corpus
    assert(got.last._3 == docs.map(_._3).distinct.size.toLong)
  }
}
