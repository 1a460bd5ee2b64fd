package graft

import org.apache.spark.sql.functions._

/** Round-6 pipeline-planning operators: brute-force replications on
  * sf0.001.
  */
class Round6iOpsSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String, String, Long)] =
    graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def setKey(text: String): String =
    text.split(" ").distinct.sorted.mkString(" ")

  private def bucket(id: Long): Long =
    (id % 1000000007L) * 2654435761L % 1000000007L % 100

  test("q_pipe_6_stage_order: 2x2 outcome matrix replicates and conserves mass") {
    val keyed = docs.map { case (id, _, text, nc) => (id, setKey(text), nc) }
    val aKeep = keyed.filter(_._3 >= 200).groupBy(_._2)
      .values.map(_.map(_._1).min).toSet
    val bKeep = keyed.groupBy(_._2).values.map(_.minBy(_._1)).filter(_._3 >= 200)
      .map(_._1).toSet
    val n = keyed.size.toLong
    val both = keyed.count(k => aKeep(k._1) && bKeep(k._1)).toLong
    val onlyA = keyed.count(k => aKeep(k._1) && !bKeep(k._1)).toLong
    val onlyB = keyed.count(k => !aKeep(k._1) && bKeep(k._1)).toLong
    val r = Registry.byName("q_pipe_6_stage_order").fn(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (n, both, onlyA, onlyB, n - both - onlyA - onlyB))
  }

  test("q_pipe_7_split_leakage: per-lang leak counts replicate the hash split + set-key match") {
    val keyed = docs.map { case (id, lang, text, _) => (id, lang, setKey(text), bucket(id) < 90) }
    val trainKeys = keyed.filter(_._4).map(_._3).toSet
    val test = keyed.filterNot(_._4)
    val expected = test.groupBy(_._2).view.mapValues { ds =>
      (ds.size.toLong, ds.count(d => trainKeys(d._3)).toLong)
    }.toMap
    val got = Registry.byName("q_pipe_7_split_leakage").fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (lang, (nt, nl, share)) =>
      assert((nt, nl) == expected(lang), s"lang $lang")
      assert(math.abs(share - math.floor(nl.toDouble / nt * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("q_pipe_8_ctx_boundary: boundary-crossing counts replicate for all three ctx sizes") {
    val ordered = docs.sortBy(_._1).map { case (_, _, text, _) => text.split(" ").length.toLong }
    val cums = ordered.scanLeft(0L)(_ + _).tail
    val total = cums.last
    val got = Registry.byName("q_pipe_8_ctx_boundary").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == Seq(128L, 256L, 512L))
    got.foreach { case (ctx, nSeqs, nSplit, share, pad) =>
      val expSplit = ordered.zip(cums).count { case (tok, c) =>
        (c - 1) / ctx > (c - tok) / ctx
      }.toLong
      val expSeqs = (total + ctx - 1) / ctx
      assert(nSeqs == expSeqs, s"ctx $ctx n_seqs")
      assert(nSplit == expSplit, s"ctx $ctx n_docs_split")
      assert(pad == expSeqs * ctx - total, s"ctx $ctx tail_pad")
      assert(math.abs(share - math.floor(expSplit.toDouble / ordered.size * 1e6 + 0.5) / 1e6) < 1e-12)
    }
    // every multiple of 2·ctx is a multiple of ctx, so doubling ctx can
    // only remove cut points: split counts must be non-increasing
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }
}
