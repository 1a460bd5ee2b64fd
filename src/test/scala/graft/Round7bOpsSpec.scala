package graft

import org.apache.spark.sql.functions._

/** Round-7 text operators: brute-force replications on sf0.001, plus a
  * synthetic multi-sentence corpus for the sentence splitter (the
  * fixture texts carry no '. ' boundaries, so the fixture exercises
  * only the one-sentence degenerate path).
  */
class Round7bOpsSpec extends SparkSpec {

  private def docs =
    graft.sources.Tables(spark, sf, "documents")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("q_text_54_sentence_len: non-vacuous sentence splitting on a synthetic corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sent_").toString
    Seq(
      (1L, "one two three. four five. six", "en", "s0", 29L),
      (2L, "a b c d. e f", "en", "s0", 12L),
      (3L, "uno dos", "es", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.byName("q_text_54_sentence_len").fn(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // en: sentences (3,2,1 tokens) + (4,2) = 5 sentences, 12 tokens, max 4
    assert(got.toSeq == Seq(
      ("en", 5L, 12L, math.floor(12.0 / 5 * 1000000 + 0.5) / 1000000, 4L),
      ("es", 1L, 2L, 2.0, 2L)))
  }

  test("q_text_54_sentence_len: fixture replication (one sentence per doc)") {
    val exp = docs.groupBy(_._1).view.mapValues { ds =>
      val toks = ds.map(_._3.split(" ").length.toLong)
      (ds.size.toLong, toks.sum, toks.max)
    }.toMap
    val got = Registry.byName("q_text_54_sentence_len").fn(spark, sf).collect()
    got.foreach { r =>
      val (n, tt, mx) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == tt && r.getLong(4) == mx)
    }
  }

  test("q_text_55_dup_ngram_share: replicates the 5-gram position/distinct algebra") {
    val exp = docs.groupBy(_._2).view.mapValues { ds =>
      val per = ds.map { d =>
        val tk = d._3.split(" ")
        val n5 = math.max(tk.length - 4, 0).toLong
        val nd = tk.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet.size.toLong
        (n5, n5 - nd)
      }
      (ds.size.toLong, per.map(_._1).sum, per.map(_._2).sum)
    }.toMap
    val got = Registry.byName("q_text_55_dup_ngram_share").fn(spark, sf).collect()
    got.foreach { r =>
      val (n, n5, dup) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == n5 && r.getLong(3) == dup,
        s"source ${r.getString(0)}")
    }
  }

  test("q_text_56_lexical_rank: replicates occurrence-weighted corpus ranks") {
    val all = docs.flatMap(_._3.split(" "))
    val ranks = all.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.zipWithIndex
      .map { case ((t, _), i) => t -> (i + 1).toLong }.toMap
    val exp = docs.groupBy(_._2).view.mapValues { ds =>
      val toks = ds.flatMap(_._3.split(" "))
      val sumRank = toks.map(ranks).sum
      (toks.length.toLong, sumRank, toks.map(ranks).max)
    }.toMap
    val got = Registry.byName("q_text_56_lexical_rank").fn(spark, sf).collect()
    got.foreach { r =>
      val (n, sr, deep) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(3) == deep)
      assert(r.getDouble(2) == math.floor(sr.toDouble / n * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_text_57_gopher_rules: integer rule predicates replicate") {
    val exp = docs.groupBy(_._2).view.mapValues { ds =>
      val flags = ds.map { d =>
        val tk = d._3.split(" ")
        val nt = tk.length.toLong
        val nu = tk.distinct.length.toLong
        val nc = d._3.length.toLong
        val dg = d._3.count(_.isDigit).toLong
        val sumLen = nc - (nt - 1)
        val rShort = if (nt < 15) 1 else 0
        val rWl = if (sumLen < 3 * nt || sumLen > 10 * nt) 1 else 0
        val rDg = if (5 * dg > nc) 1 else 0
        val rRep = if (5 * nu < 2 * nt) 1 else 0
        (rShort, rWl, rDg, rRep)
      }
      (flags.map(_._1).sum.toLong, flags.map(_._2).sum.toLong,
        flags.map(_._3).sum.toLong, flags.map(_._4).sum.toLong,
        flags.count(f => f._1 + f._2 + f._3 + f._4 >= 2).toLong,
        flags.count(f => f._1 + f._2 + f._3 + f._4 == 0).toLong)
    }.toMap
    val got = Registry.byName("q_text_57_gopher_rules").fn(spark, sf).collect()
    got.foreach { r =>
      val (s1, s2, s3, s4, multi, clean) = exp(r.getString(0))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
        ((s1, s2, s3, s4, multi)), s"source ${r.getString(0)}")
      assert(r.getDouble(7) ==
        math.floor(clean.toDouble / r.getLong(1) * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_text_58_char_bigram_entropy: replicates for one lang; bounded by log2(alphabet)") {
    val got = Registry.byName("q_text_58_char_bigram_entropy").fn(spark, sf).collect()
    got.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= math.log(r.getLong(2).toDouble) / math.log(2) + 1e-9)
    }
    val lang0 = got.head.getString(0)
    val bgs = docs.filter(_._1 == lang0).flatMap(d => d._3.sliding(2).filter(_.length == 2))
    val counts = bgs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val n = counts.map(_._2).sum
    val slc = counts.map { case (_, c) => c.toDouble * math.log(c.toDouble) }.sum
    val h = (math.log(n.toDouble) - slc / n) / math.log(2.0)
    val r0 = got.find(_.getString(0) == lang0).get
    assert(r0.getLong(1) == n && r0.getLong(2) == counts.size.toLong)
    assert(math.abs(r0.getDouble(3) - h) < 1e-5)
  }
}
