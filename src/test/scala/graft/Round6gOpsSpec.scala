package graft

import org.apache.spark.sql.functions._

/** Round-6 embedding-structure operators: brute-force replications on
  * sf0.001 (500 vectors; the %4 slice is 125).
  */
class Round6gOpsSpec extends SparkSpec {

  private lazy val vecs: Array[(Long, Int, Array[Float])] =
    graft.sources.Tables(spark, sf, "embeddings")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).toArray))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += (a(i) * b(i)).toDouble
      na += (a(i) * a(i)).toDouble
      nb += (b(i) * b(i)).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Directed 5-NN edge set over the %4 slice (cos desc, id tiebreak). */
  private lazy val top5: Map[Long, Seq[Long]] = {
    val slice = vecs.filter(_._1 % 4 == 0)
    slice.map { case (id, _, e) =>
      id -> slice.filter(_._1 != id)
        .map { case (id2, _, e2) => (id2, cos(e, e2)) }
        .sortBy { case (id2, c) => (-c, id2) }
        .take(5).map(_._1).toSeq
    }.toMap
  }

  test("q_sim_35_hubness: in-degree histogram matches brute force and conserves mass") {
    val indeg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    top5.values.flatten.foreach(d => indeg(d) += 1)
    val expected = top5.keys.toSeq.map(indeg).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val got = Registry.byName("q_sim_35_hubness").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    // mass conservation: Σ indeg·count == 5·n (every vector casts 5 votes)
    assert(got.map { case (k, v) => k * v }.sum == 5L * top5.size)
  }

  test("q_sim_36_mutual_knn: per-label mutual shares match brute force") {
    val labelOf = vecs.map(v => v._1 -> v._2).toMap
    val edges = top5.toSeq.flatMap { case (s, ds) => ds.map(d => (s, d)) }
    val edgeSet = edges.toSet
    val expected = edges.groupBy { case (s, _) => labelOf(s) }
      .view.mapValues { es =>
        val mutual = es.count { case (s, d) => edgeSet.contains((d, s)) }
        (es.size.toLong, mutual.toLong)
      }.toMap
    val got = Registry.byName("q_sim_36_mutual_knn").fn(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (lab, (ne, nm, share)) =>
      assert((ne, nm) == expected(lab), s"label $lab")
      assert(math.abs(share - math.floor(nm.toDouble / ne * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("q_sim_37_rp_distortion: ratios concentrate near 1 and replicate on a sample pair") {
    val rows = Registry.byName("q_sim_37_rp_distortion").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lab, n, mean, lo, hi) =>
      assert(n > 0 && lo <= mean && mean <= hi, s"label $lab ordering")
      assert(mean > 0.4 && mean < 1.8, s"label $lab mean $mean not JL-concentrated")
    }
    // replicate one pair end-to-end (vec_id 0 vs 1)
    val a = vecs.find(_._1 == 0L).get._3
    val b = vecs.find(_._1 == 1L).get._3
    val diff = a.zip(b).map { case (x, y) => x - y }
    val plist = (0 to 15).map { j =>
      (0 to 63).foldLeft(0.0) { (acc, d) =>
        val sign = if (((d * 17 + j) * 2654435761L % 1000000007L) % 2 == 0) 1 else -1
        acc + sign * diff(d).toDouble
      }
    }
    val projsq = plist.foldLeft(0.0)((acc, x) => acc + x * x) / 16
    val origsq = diff.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    val r = projsq / origsq
    assert(r > 0.2 && r < 3.0, s"single-pair ratio $r implausible")
  }

  test("q_sim_38_anisotropy: identity matches the quantized brute-force pair mean") {
    val q = 1000
    val units = vecs.map { case (id, lab, e) =>
      val nrm = math.sqrt(e.foldLeft(0.0)((acc, x) => acc + (x * x).toDouble))
      (id, lab, e.map(x => math.floor(x.toDouble / nrm * q + 0.5).toLong))
    }
    def meanCos(us: Array[(Long, Int, Array[Long])]): Double = {
      val n = us.length
      var num = 0L
      for (d <- 0 until 64) {
        val sd = us.map(_._3(d)).sum
        num += sd * sd
      }
      val selfsum = us.map(_._3.map(x => x * x).sum).sum
      (num - selfsum).toDouble / (1e6 * n * (n - 1).toDouble)
    }
    val got = Registry.byName("q_sim_38_anisotropy").fn(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // global row
    val (gn, gcos) = got(-1)
    assert(gn == units.length)
    assert(math.abs(gcos - math.floor(meanCos(units) * 1e6 + 0.5) / 1e6) < 1e-9)
    // one label group replicated too
    val lab0 = units.filter(_._2 == 0)
    val (n0, c0) = got(0)
    assert(n0 == lab0.length)
    assert(math.abs(c0 - math.floor(meanCos(lab0) * 1e6 + 0.5) / 1e6) < 1e-9)
  }
}
