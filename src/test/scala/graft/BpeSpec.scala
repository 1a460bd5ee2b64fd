package graft

import org.apache.spark.sql.functions._

/** Property tests for the production BPE encoder (Bpe.encodeFast, the
  * r12 delivery of q_text_20's docstring promise): equal to the spec
  * fold form (Bpe.encode) on trained tables over real and randomized
  * corpora, loud failure on order-ambiguous tables where the two
  * algorithms genuinely diverge, pass-through of unknown symbols, and
  * the lossless round-trip.
  */
class BpeSpec extends SparkSpec {
  import graft.functions.Bpe

  private def charSyms(c: org.apache.spark.sql.Column) = split(c, "")

  test("encodeFast == encode on a table trained from the fixture corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter(col("doc_id") < 200)
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(charSyms(col("tok")).as("syms"))
    val merges = Bpe.train(corpus, 30)
    assert(merges.size > 10, s"fixture should yield >10 merges, got ${merges.size}")
    val toks = docs.filter(col("doc_id") < 100)
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(charSyms(col("tok")).as("syms"))
    val both = toks
      .select(Bpe.encode(col("syms"), merges).as("spec"),
        Bpe.encodeFast(col("syms"), merges).as("fast"))
    assert(both.filter(not(col("spec") === col("fast"))).count() == 0,
      "fold form and min-rank encoder must agree element-for-element")
  }

  test("encodeFast == encode on randomized corpora with tables trained on them") {
    val s = spark
    import s.implicits._
    // three deterministic pseudo-random corpora over a 4-letter alphabet
    // (small alphabet maximizes merge collisions and repeated-symbol
    // runs — the overlap edge cases)
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val words = (1 to 400).map { _ =>
        (1 to (2 + rnd.nextInt(9))).map(_ => "abcd" (rnd.nextInt(4))).mkString
      }
      val corpus = words.toDF("tok").select(charSyms(col("tok")).as("syms"))
      val merges = Bpe.train(corpus, 25, minFreq = 2L)
      val both = corpus
        .select(Bpe.encode(col("syms"), merges).as("spec"),
          Bpe.encodeFast(col("syms"), merges).as("fast"))
      assert(both.filter(not(col("spec") === col("fast"))).count() == 0,
        s"seed $seed: fold and min-rank encoders diverged")
    }
  }

  test("encodeFast round-trips losslessly and passes unknown symbols through") {
    val s = spark
    import s.implicits._
    val corpus = Seq("aaab", "aaab", "ab").toDF("tok")
      .select(charSyms(col("tok")).as("syms"))
    val merges = Bpe.train(corpus, 2)
    // symbols x/y/z are outside the merge alphabet -> must pass through
    val enc = Seq("aaab", "xyz", "axb").toDF("tok")
      .select(col("tok"),
        Bpe.encodeFast(charSyms(col("tok")), merges).as("e"),
        concat_ws("", Bpe.encodeFast(charSyms(col("tok")), merges)).as("rt"))
      .collect()
    val byTok = enc.map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(byTok("aaab") == Seq("aa", "ab"), "greedy non-overlap: [a,a,a,b] -> [aa,ab]")
    assert(byTok("xyz") == Seq("x", "y", "z"), "unknown symbols never merge")
    assert(byTok("axb") == Seq("a", "x", "b"), "unknown symbol blocks the (a,b) adjacency")
    enc.foreach(r => assert(r.getString(0) == r.getString(2), "round trip"))
  }

  test("encodeFast refuses an order-ambiguous table (where fold and loop diverge)") {
    val s = spark
    import s.implicits._
    // rank 3 re-creates "abc", the component of rank 2: the min-rank
    // loop would re-enable rank 2 after rank 3 fires; the fold cannot.
    val ambiguous = Seq((1, "a", "bc", 5L), (2, "abc", "d", 4L), (3, "ab", "c", 3L))
    val df = Seq("q").toDF("tok").select(charSyms(col("tok")).as("syms"))
    val ex = intercept[Exception] {
      df.select(Bpe.encodeFast(col("syms"), ambiguous).as("e")).collect()
    }
    def rootMessages(t: Throwable): List[String] =
      Option(t.getMessage).toList ++ Option(t.getCause).toList.flatMap(rootMessages)
    assert(rootMessages(ex).exists(_.contains("order-ambiguous")),
      s"expected the build-time precondition failure, got: $ex")
  }

  test("encodeFast refuses duplicate ranks (which would spin encodeTokens forever)") {
    // r12 ADVICE: with two pairs at one rank, rankInfo keeps only the
    // last pair while pairInfo can report the other as bestRank — the
    // merge pass matches nothing and the loop never terminates. The
    // codec must fail LOUDLY at build time instead.
    val s = spark
    import s.implicits._
    val dup = Seq((1, "a", "b", 3L), (1, "c", "d", 2L))
    val df = Seq("q").toDF("tok").select(charSyms(col("tok")).as("syms"))
    val ex = intercept[Exception] {
      df.select(Bpe.encodeFast(col("syms"), dup).as("e")).collect()
    }
    def rootMessages(t: Throwable): List[String] =
      Option(t.getMessage).toList ++ Option(t.getCause).toList.flatMap(rootMessages)
    assert(rootMessages(ex).exists(_.contains("duplicate rank")),
      s"expected the duplicate-rank build failure, got: $ex")
  }

  test("encodeFast handles empty and null arrays") {
    val s = spark
    import s.implicits._
    val merges = Seq((1, "a", "b", 2L))
    val df = Seq(Some(Seq.empty[String]), None, Some(Seq("a", "b")))
      .toDF("syms")
    val out = df.select(Bpe.encodeFast(col("syms"), merges).as("e")).collect()
    assert(out(0).getSeq[String](0) == Nil)
    assert(out(1).isNullAt(0))
    assert(out(2).getSeq[String](0) == Seq("ab"))
  }
}
