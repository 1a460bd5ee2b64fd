package graft

import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws over the engine's primitives (SURVEY §5.3), sampled
  * with scalacheck Gens (deterministic seeds; plain scalatest asserts —
  * the scalatest/scalacheck bridge artifact is not on the offline
  * classpath).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
  private val textGen = Gen.nonEmptyListOf(word).map(_.take(12).mkString(" "))
  private val vecGen = Gen.listOfN(8, Gen.chooseNum(-5f, 5f)).map(_.toArray)
    .suchThat(v => v.exists(x => math.abs(x) > 0.01f))

  test("dedup is idempotent: distinct∘distinct == distinct") {
    for (xs <- samples(Gen.nonEmptyListOf(Gen.chooseNum(0, 5)), 5)) {
      val df = xs.toDF("x")
      val once = df.distinct()
      assert(once.distinct().count() == once.count())
      assert(once.except(once).count() == 0)
    }
  }

  test("minhash signature is permutation- and duplication-invariant") {
    val rnd = new scala.util.Random(7)
    for (t <- samples(textGen, 5)) {
      val toks = t.split(" ").toSeq
      val shuffled = (rnd.shuffle(toks) ++ toks.headOption).mkString(" ")
      val sigs = Seq((1L, t), (2L, shuffled)).toDF("id", "text")
        .orderBy("id")
        .select(TextFunctions.minhashSignature($"text", 8)).collect()
      assert(sigs(0).getSeq[Long](0) == sigs(1).getSeq[Long](0))
    }
  }

  test("cosine(v, v) == 1 and cosine is symmetric") {
    for (Seq(a, b) <- samples(Gen.listOfN(2, vecGen), 5)) {
      val r = Seq((a, b)).toDF("a", "b").select(
        VectorFunctions.cosine($"a", $"a").as("self"),
        VectorFunctions.cosine($"a", $"b").as("ab"),
        VectorFunctions.cosine($"b", $"a").as("ba")).collect().head
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12)
    }
  }

  test("rollup row count == detail groups + level-1 groups + 1") {
    val df = graft.sources.Tables(spark, sf, "lineitem")
    val detail = df.select("l_returnflag", "l_linestatus").distinct().count()
    val level1 = df.select("l_returnflag").distinct().count()
    val rollupRows = Registry.byName("q_agg_5_rollup").fn(spark, sf).count()
    assert(rollupRows == detail + level1 + 1)
  }

  test("running window sum is monotone and its max equals the group total") {
    // o_totalprice > 0 ⇒ the running sum's max per customer IS its final
    // value, which must equal the directly-aggregated rounded total.
    val running = Registry.byName("q_win_2_running").fn(spark, sf)
      .groupBy("o_custkey").agg(max($"running_spend").as("final_run"))
    val direct = graft.sources.Tables(spark, sf, "orders")
      .groupBy($"o_custkey")
      .agg(graft.functions.Num.round(sum($"o_totalprice"), 2).as("total"))
    val bad = running.join(direct, "o_custkey")
      .filter(abs($"final_run" - $"total") > 1e-9)
    assert(bad.count() == 0)
  }
}
