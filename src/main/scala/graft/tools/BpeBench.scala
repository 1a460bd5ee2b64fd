package graft.tools

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE encoder microbench (r12, VERDICT r11 item 5): the fold form vs
  * the production min-rank encoder at a small trained table, then the
  * production encoder alone at a SYNTHETIC 32k-merge table — the size
  * the fold form structurally cannot plan (32k chained projections).
  *
  * The 32k table is well-formed by construction: level-0 merges pair
  * the 26 base letters ((a,a)..(z,z) wrapping), and each later merge
  * pairs an earlier product with a base letter — components always
  * precede their pair, products never collide (each product string is
  * the concatenation path, unique by construction), so the build-time
  * ambiguity check passes and the encoder is exact.
  *
  * Usage: graft.tools.BpeBench [nDocs] — prints per-form timings and
  * the row-equality check between fold and fast at the small table.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession()
    import spark.implicits._
    val nDocs = args.lift(0).map(_.toInt).getOrElse(20000)

    val letters = "abcdefghijklmnopqrstuvwxyz"
    val rnd = new scala.util.Random(7)
    val corpus = (1 to nDocs).map { _ =>
      (1 to (3 + rnd.nextInt(10))).map(_ => letters(rnd.nextInt(26))).mkString
    }.toDF("tok").select(split(col("tok"), "").as("syms")).localCheckpoint()

    // small TRAINED table: fold vs fast must agree row-for-row
    val trained = Bpe.train(corpus, 50, minFreq = 2L)
    println(s"trained ${trained.size} merges from $nDocs synthetic words")

    def time(name: String)(f: => Long): Long = {
      f // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val v = f
        ((System.nanoTime() - t0) / 1e9, v)
      }.minBy(_._1)
      println(f"$name%-28s ${best._1}%8.3f s   (checksum ${best._2})")
      best._2
    }

    val cFold = time(s"fold   (${trained.size} merges)") {
      corpus.select(sum(size(Bpe.encode(col("syms"), trained))).as("s"))
        .head().getLong(0)
    }
    val cFast = time(s"fast   (${trained.size} merges)") {
      corpus.select(sum(size(Bpe.encodeFast(col("syms"), trained))).as("s"))
        .head().getLong(0)
    }
    require(cFold == cFast, s"fold/fast checksum mismatch: $cFold vs $cFast")
    val eq = corpus.select(Bpe.encode(col("syms"), trained).as("a"),
      Bpe.encodeFast(col("syms"), trained).as("b"))
      .filter(not(col("a") === col("b"))).count()
    require(eq == 0, s"$eq rows diverged between fold and fast")
    println("fold == fast row-for-row at the trained table")

    // synthetic 32k-merge table: fast only (the fold form cannot plan it)
    val base = letters.map(_.toString)
    val merges32k = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var products = base.toVector
    val seen = scala.collection.mutable.Set(base: _*)
    var rank = 1
    var step = 0
    while (merges32k.size < 32768) {
      val a = products(step % products.size)
      val b = base(step % 26)
      step += 1
      if (!seen(a + b)) { // product uniqueness keeps the table unambiguous
        merges32k += ((rank, a, b, 1L))
        products = products :+ (a + b)
        seen += (a + b)
        rank += 1
      }
    }
    time("fast   (32768 merges)") {
      corpus.select(sum(size(Bpe.encodeFast(col("syms"), merges32k.toSeq))).as("s"))
        .head().getLong(0)
    }
    spark.stop()
  }
}
