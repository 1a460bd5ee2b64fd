package graft

import org.apache.spark.sql.functions._

/** Round-7 embedding operators: brute-force replications on sf0.001. */
class Round7dOpsSpec extends SparkSpec {

  private def vecs(limit: Int) =
    graft.sources.Tables(spark, sf, "embeddings")
      .filter(col("vec_id") < limit).orderBy("vec_id")
      .select(col("vec_id"), col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))

  // fixed left-fold accumulation, mirroring VectorFunctions
  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = (a(i) - b(i)).toDouble; acc += d * d; i += 1 }
    acc
  }
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += (a(i) * b(i)).toDouble; na += (a(i) * a(i)).toDouble
      nb += (b(i) * b(i)).toDouble; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q_sim_39_twonn_dim: nearest-pair ratios replicate; estimate positive") {
    val v = vecs(200)
    val ln6s = v.map { case (i, _, ei) =>
      val ds = v.filter(_._1 != i).map(o => (sqDist(ei, o._3), o._1)).sortBy(identity)
      (ds(0)._1, ds(1)._1)
    }.filter(_._1 > 0)
      .map { case (d1, d2) => math.floor(0.5 * math.log(d2 / d1) * 1000000 + 0.5).toLong }
    val r = Registry.byName("q_sim_39_twonn_dim").fn(spark, sf).collect().head
    assert(r.getLong(0) == ln6s.length.toLong)
    assert(r.getLong(1) == ln6s.sum)
    assert(r.getDouble(2) > 0)
  }

  test("q_sim_40_bitwidth_sweep: rmse decreases with bits; 8-bit errors bounded by half-step") {
    val rows = Registry.byName("q_sim_40_bitwidth_sweep").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L))
    assert(rows(0)._3 > rows(1)._3 && rows(1)._3 > rows(2)._3)
    rows.foreach { case (bits, _, _, maxErr) =>
      val halfStep = 0.5 / (math.pow(2, bits - 1) - 1)
      assert(maxErr <= halfStep + 1e-6, s"bits=$bits maxErr=$maxErr")
    }
  }

  test("q_sim_41_homophily: per-label neighbor counts replicate; lift = homophily/prevalence") {
    val v = vecs(300)
    val exp = v.map { case (i, la, ei) =>
      val nn = v.filter(_._1 != i)
        .map(o => (cos(ei, o._3), o._1, o._2))
        .sortBy { case (c, j, _) => (-c, j) }.take(10)
      (la, nn.count(_._3 == la).toLong)
    }.groupBy(_._1).view.mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val rows = Registry.byName("q_sim_41_homophily").fn(spark, sf).collect()
    rows.foreach { r =>
      val (np, same) = exp(r.getLong(0))
      assert(r.getLong(1) == np, s"label ${r.getLong(0)}")
      assert(r.getDouble(2) ==
        math.floor(same.toDouble / (10 * np) * 1000000 + 0.5) / 1000000)
    }
  }

  test("q_sim_42_cos_dot_disagree: overlap replicates for every probe") {
    val e = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val probes = e.filter(_._1 < 8)
    val cand = e.filter(_._1 >= 8)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += (a(i) * b(i)).toDouble; i += 1 }
      acc
    }
    val exp = probes.map { case (pid, pv) =>
      val byCos = cand.map(c => (cos(c._2, pv), c._1)).sortBy { case (s, j) => (-s, j) }
        .take(10).map(_._2).toSet
      val byDot = cand.map(c => (dot(c._2, pv), c._1)).sortBy { case (s, j) => (-s, j) }
        .take(10).map(_._2).toSet
      pid -> (byCos & byDot).size.toLong
    }.toMap
    val rows = Registry.byName("q_sim_42_cos_dot_disagree").fn(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach(r => assert(r.getLong(1) == exp(r.getLong(0)), s"probe ${r.getLong(0)}"))
  }
}
