package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Round-7u operations-surface wave: brute-force replications on sf0.001. */
class Round7uOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }
  private def c2(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  test("q_join_24_hint_strategies: both strategies agree and plans differ") {
    val df = Registry.byName("q_join_24_hint_strategies").fn(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, rb, rm, agree) => assert(rb == rm && agree == 1L) }
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"), "hinted broadcast join must appear")
    assert(plan.contains("SortMergeJoin"), "hinted merge join must appear")
  }

  test("q_ml_15_brier: decomposition identity rel - res + unc == brier, replicated") {
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select("o_totalprice", "o_orderstatus").collect()
      .map(r => (c2(r.getDouble(0)) % 1000, if (r.getString(1) == "F") 1L else 0L))
    val bins = ord.groupBy(_._1 / 100).map { case (_, rs) =>
      (rs.length.toLong, rs.map(_._1).sum, rs.map(_._2).sum)
    }.toSeq
    val nn = bins.map(_._1).sum
    val gbar = bins.map(_._3).sum.toDouble / nn
    val rel = bins.map { case (n, sp, sy) =>
      val p = sp.toDouble / n / 1000; val y = sy.toDouble / n
      n * (p - y) * (p - y)
    }.sum / nn
    val res = bins.map { case (n, _, sy) =>
      val y = sy.toDouble / n; n * (y - gbar) * (y - gbar)
    }.sum / nn
    val unc = gbar * (1 - gbar)
    val got = Registry.byName("q_ml_15_brier").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == nn)
    assert(got.getDouble(1) == rnd(rel, 6))
    assert(got.getDouble(2) == rnd(res, 6))
    assert(got.getDouble(3) == rnd(unc, 6))
    // r8: `brier` is the TRUE mean (p − y)² off the exact integer
    // Σ(pm − 1000y)², and `resid` is the gap the binned Murphy
    // identity leaves (the r7 ADVICE fix)
    val bq = ord.map { case (pm, y) => val e = pm - 1000L * y; e * e }.sum
    val bt = bq.toDouble / 1000000 / nn
    assert(got.getDouble(4) == rnd(bt, 6))
    assert(got.getDouble(5) == rnd(bt - (rel - res + unc), 6))
    // the binned identity approximates the true score (within-bin
    // variance bound) — resid stays small on this fixture
    assert(math.abs((rel - res + unc) - bt) < 0.02,
      "decomposition must approximate the direct Brier (within-bin variance bound)")
  }

  test("q_agg_47_listagg: ordered comma strings replicate") {
    val cust = graft.sources.Tables(spark, sf, "customer")
      .select("c_mktsegment", "c_nationkey").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val exp = cust.map(_._1).distinct.sorted.map { sg =>
      val nks = cust.filter(_._1 == sg).map(_._2).distinct.sorted
      (sg, nks.mkString(","), nks.length.toLong)
    }
    val got = Registry.byName("q_agg_47_listagg").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_priv_10_pseudonymize: joins intact, tokens collision-free") {
    val got = Registry.byName("q_priv_10_pseudonymize").fn(spark, sf).collect()(0)
    val nOrd = graft.sources.Tables(spark, sf, "orders").count()
    assert(got.getLong(0) == nOrd, "every order joins its customer on the fixture")
    assert(got.getLong(0) == got.getLong(1))
    assert(got.getLong(2) == got.getLong(3))
    assert(got.getLong(4) == 1L)
    // sha2 determinism spot check
    val tok = java.security.MessageDigest.getInstance("SHA-256")
      .digest("graft2026|1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    import org.apache.spark.sql.functions.{lit, sha2}
    val sparkTok = spark.range(1).select(sha2(lit("graft2026|1"), 256)).collect()(0).getString(0)
    assert(sparkTok == tok)
  }

  test("q_scan_26_recursive_glob: nested copies both surface") {
    val got = Registry.byName("q_scan_26_recursive_glob").fn(spark, sf).collect()(0)
    val n = graft.sources.Tables(spark, sf, "nation").count()
    assert(got.getLong(0) == 2 * n)
    assert(got.getLong(1) == n)
    assert(got.getLong(2) == 0L)
  }
}
