package graft

import org.apache.spark.sql.functions._

/** Round-6 LLM-pipeline operators: brute-force replications over the
  * collected sf0.001 documents/embeddings fixtures.
  */
class Round6bOpsSpec extends SparkSpec {

  private lazy val docs: Array[(Long, String, String)] =
    graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q_text_49_char_classes: one source's class counts replicate") {
    val rows = Registry.byName("q_text_49_char_classes").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val src = rows.head.getString(0)
    val texts = docs.filter(_._2 == src).map(_._3)
    val n = texts.map(_.length.toLong).sum
    val up = texts.map(_.count(c => c >= 'A' && c <= 'Z').toLong).sum
    val dg = texts.map(_.count(c => c >= '0' && c <= '9').toLong).sum
    assert(rows.head.getLong(1) == texts.length.toLong)
    assert(rows.head.getLong(2) == n)
    assert(rows.head.getDouble(3) == math.floor(up.toDouble / n * 1000000 + 0.5) / 1000000)
    assert(rows.head.getDouble(4) == math.floor(dg.toDouble / n * 1000000 + 0.5) / 1000000)
  }

  test("q_text_50_boilerplate: cross-doc sentence counts replicate") {
    val sen = docs.flatMap { case (id, src, t) =>
      t.split("\\. ").map(_.trim).filter(_.length >= 20).map(s => (id, src, s))
    }
    val nd = sen.map(x => (x._3, x._1)).distinct.groupBy(_._1).view.mapValues(_.length).toMap
    val expected = sen.groupBy(_._2).view.mapValues { ss =>
      (ss.length.toLong, ss.count(x => nd(x._3) >= 2).toLong)
    }.toMap
    val rows = Registry.byName("q_text_50_boilerplate").fn(spark, sf).collect()
    rows.foreach { r =>
      val (n, b) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == b, s"source ${r.getString(0)}")
    }
  }

  test("q_dedup_26_prefix_cluster: identities hold and groups replicate") {
    val r = Registry.byName("q_dedup_26_prefix_cluster").fn(spark, sf).collect().head
    val groups = docs.map(_._3.take(40)).groupBy(identity).view.mapValues(_.length).toMap
    assert(r.getLong(0) == docs.length.toLong)
    assert(r.getLong(1) == groups.size.toLong)
    assert(r.getLong(3) == r.getLong(0) - r.getLong(1)) // dup docs = docs - groups
    assert(r.getLong(2) == groups.values.count(_ >= 2).toLong)
  }

  test("q_ml_10_ridge: lambda=0 equals the OLS slopes; shrinkage is monotone") {
    val rows = Registry.byName("q_ml_10_ridge").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val ols = Registry.byName("q_ml_8_ols_multi").fn(spark, sf).collect().head
    assert(math.abs(rows.head._2 - ols.getDouble(1)) < 1e-3)
    assert(math.abs(rows.head._3 - ols.getDouble(2)) < 1e-3)
    // |coef| never grows as lambda grows
    rows.sliding(2).filter(_.length == 2).foreach { w =>
      assert(math.abs(w(1)._2) <= math.abs(w(0)._2) + 1e-9)
      assert(math.abs(w(1)._3) <= math.abs(w(0)._3) + 1e-9)
    }
  }

  test("q_pipe_4_waterfill: allocation replicates and respects the budget") {
    val rows = Registry.byName("q_pipe_4_waterfill").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val toks = docs.groupBy(_._2).view
      .mapValues(_.map(d => d._3.length.toLong / 5).sum).toMap
    // documents fixture text == n_chars? waterfill uses the n_chars
    // column; recompute from it to match exactly
    val tokCol = graft.sources.Tables(spark, sf, "documents")
      .groupBy("source").agg(sum(expr("n_chars div 5")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val budget = tokCol.values.sum / 2
    val n = tokCol.size
    val fair = budget / n
    val alloc1 = tokCol.view.mapValues(t => math.min(t, fair)).toMap
    val leftover = budget - alloc1.values.sum
    val m = tokCol.values.count(_ > fair)
    val extra = if (m > 0) leftover / m else 0L
    rows.foreach { case (src, t, a1, af, ex) =>
      assert(t == tokCol(src))
      assert(a1 == alloc1(src))
      val expFinal = if (t > fair) math.min(t, fair + extra) else a1
      assert(af == expFinal, s"source $src")
      assert(ex == (if (t <= fair) 1L else 0L))
    }
    assert(rows.map(_._4).sum <= budget)
    assert(toks.keySet == tokCol.keySet)
  }

  test("q_ret_9_exposure: shares sum to ~1 and slots fill when candidates suffice") {
    val rows = Registry.byName("q_ret_9_exposure").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nCand = graft.sources.Tables(spark, sf, "embeddings")
      .filter(col("vec_id") >= 8).count()
    if (nCand >= 10) assert(rows.map(_._2).sum == 80L)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    rows.foreach { case (_, slots, share) => assert(slots > 0 && share > 0) }
  }
}
