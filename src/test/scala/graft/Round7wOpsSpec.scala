package graft

/** Round-7w final pins: brute-force replications on sf0.001. */
class Round7wOpsSpec extends SparkSpec {

  test("q_time_26_dow_conventions: ISO mapping equals java.time, weekend flags exact") {
    import org.apache.spark.sql.functions.{col, date_format}
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
      .collect().map(_.getString(0))
    val exp = ord.map { od =>
      val dt = java.time.LocalDate.parse(od)
      (dt.getDayOfWeek.getValue.toLong, dt.`with`(java.time.DayOfWeek.MONDAY).toString)
    }
    val expAgg = exp.groupBy(_._1).toSeq.sortBy(_._1).map { case (dow, rs) =>
      (dow, rs.length.toLong, rs.map(_._2).distinct.size.toLong,
        if (dow >= 6) rs.length.toLong else 0L)
    }
    val got = Registry.byName("q_time_26_dow_conventions").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expAgg.toSeq)
    assert(got.map(_._1).toSeq == (1L to 7L), "all seven ISO buckets present")
  }

  test("q_sim_43_two_stage_recall: stages replicate an in-memory pipeline") {
    val emb = graft.sources.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val vecs = emb.toMap
    def bucket(v: Array[Float]): Long = {
      var b = 0L
      for (j <- 0 until 8) {
        var dot = 0.0
        for (i <- v.indices) dot += v(i).toDouble * (((i * 31 + j * 17) % 7) - 3)
        if (dot > 0) b += (1L << j)
      }
      b
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val p = vecs(0L)
    val pb = bucket(p)
    val cand = emb.filter(e => e._1 != 0L && bucket(e._2) == pb).map(_._1).toSet
    val truth = emb.filter(_._1 != 0L).map(e => (e._1, cos(e._2, p)))
      .sortBy(e => (-e._2, e._1)).take(5).map(_._1).toSet
    val rerank = emb.filter(e => cand(e._1)).map(e => (e._1, cos(e._2, p)))
      .sortBy(e => (-e._2, e._1)).take(5).map(_._1).toSet
    val got = Registry.byName("q_sim_43_two_stage_recall").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == cand.size.toLong)
    assert(got.getLong(1) == (cand & truth).size.toLong)
    assert(got.getLong(2) == (rerank & truth).size.toLong)
    assert(got.getDouble(3) ==
      math.floor((rerank & truth).size.toDouble / 5 * 1e6 + 0.5) / 1e6)
    assert(got.getLong(2) <= got.getLong(1), "rerank cannot exceed the stage-1 ceiling")
  }
}
