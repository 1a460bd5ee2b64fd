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

  test("k-means final assignment is the argmin over the final centroids") {
    // reconstruct the final centroids from the assignment itself and
    // check no vector is closer to a foreign centroid than its own
    val assigned = Registry.byName("q_sim_7_kmeans").fn(spark, sf)
      .select($"vec_id", $"cluster", $"dist")
    val e = graft.sources.Tables(spark, sf, "embeddings")
      .filter($"vec_id" < 200)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    // the centroids the query assigns against: one Lloyd update from the
    // deterministic init (NOT centroids recomputed from the final
    // assignment — Lloyd hasn't converged after one round)
    val init = e.filter($"vec_id" < 4).select($"vec_id".as("cid"), $"v".as("cvec"))
    val cents = graft.functions.KMeans.update(graft.functions.KMeans.assign(e, init))
    val worse = e.crossJoin(broadcast(cents))
      .select($"vec_id", $"cid",
        sqrt(VectorFunctions.sqDist($"v", $"cvec")).as("d"))
      .join(assigned, "vec_id")
      .filter($"d" < $"dist" - 2e-6) // strictly closer (beyond dist's 6dp rounding quantum)
    assert(worse.count() == 0)
  }

  test("LSH clustering: every candidate pair lands in one component; non-candidates are singletons") {
    val comp = Registry.byName("q_dedup_7_lsh_cluster").fn(spark, sf)
      .select($"doc_id", $"component", $"csize").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = Registry.byName("q_dedup_3_minhash_lsh").fn(spark, sf)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((a, b) <- pairs)
      assert(comp(a)._1 == comp(b)._1, s"pair ($a,$b) split across components")
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    for ((doc, (c, size)) <- comp if !inPairs.contains(doc)) {
      assert(c == doc && size == 1L, s"doc $doc has no candidate edge but csize=$size")
    }
  }

  test("PQ: codebook vectors encode to their own codeword in every subspace") {
    // vectors 0..3 ARE the codebook → their per-subspace nearest codeword
    // is themselves (distance 0), so their code must be their own id 8×.
    val sub = graft.sources.Tables(spark, sf, "embeddings")
      .select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", ($"pos" / 8).cast("long").as("ss"),
        ($"pos" % 8).as("spos"), $"col".cast("double").as("val"))
    val cb = sub.filter($"vec_id" < 4)
      .select($"vec_id".as("cid"), $"ss".as("b_ss"), $"spos".as("b_spos"), $"val".as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id", "ss").orderBy($"d2", $"cid")
    val code = sub.join(broadcast(cb), $"ss" === $"b_ss" && $"spos" === $"b_spos")
      .groupBy("vec_id", "ss", "cid")
      .agg(sum(($"val" - $"c") * ($"val" - $"c")).as("d2"))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val selfMiscoded = code.filter($"vec_id" < 4 && $"cid" =!= $"vec_id")
    assert(selfMiscoded.count() == 0)
    // and every vector gets exactly 8 codes
    val badArity = code.groupBy("vec_id").count().filter($"count" =!= 8)
    assert(badArity.count() == 0)
  }
}
