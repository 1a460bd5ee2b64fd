package graft

import org.apache.spark.sql.functions._

/** Round-7 pipeline/ML/retrieval/UDAF operators: brute-force
  * replications on sf0.001.
  */
class Round7gOpsSpec extends SparkSpec {

  test("q_pipe_9_shard_balance: portable-hash shards replicate; totals conserved") {
    val P = 1000000007L
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val shards = docs.groupBy(d => ((d._1 % P) * 2654435761L % P) % 16)
      .view.mapValues(_.map(_._2 / 5).sum).toMap
    val r = Registry.byName("q_pipe_9_shard_balance").fn(spark, sf).collect().head
    assert(r.getLong(0) == shards.size.toLong)
    assert(r.getLong(1) == docs.length.toLong)
    assert(r.getLong(2) == shards.values.min && r.getLong(3) == shards.values.max)
  }

  test("q_ml_12_logit_step: closed form replicates from raw sums") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .select(col("l_quantity").cast("long"), col("l_returnflag")).collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "R") 1L else 0L))
    val n = li.length.toLong
    val sx = li.map(_._1).sum; val sxx = li.map(x => x._1 * x._1).sum
    val sy = li.map(_._2).sum; val sxy = li.filter(_._2 == 1).map(_._1).sum
    val den = n.toDouble * sxx - sx.toDouble * sx
    val gy = sy.toDouble - n.toDouble / 2
    val gxy = sxy.toDouble - sx.toDouble / 2
    val b0 = 4.0 * (sxx.toDouble * gy - sx.toDouble * gxy) / den
    val b1 = 4.0 * (n.toDouble * gxy - sx.toDouble * gy) / den
    val r = Registry.byName("q_ml_12_logit_step").fn(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == sy)
    assert(r.getDouble(3) == math.floor(b0 * 1000000 + 0.5) / 1000000)
    assert(r.getDouble(4) == math.floor(b1 * 1000000 + 0.5) / 1000000)
  }

  test("q_ret_10_err: cascade model replicates per source; bounded by 1") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select("source", "lang", "n_chars", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exp = docs.groupBy(_._1).view.mapValues { ds =>
      val ranked = ds.sortBy(d => (-d._3, d._4)).take(10)
      var relBefore = 0L
      var sum9 = 0L
      ranked.zipWithIndex.foreach { case (d, i) =>
        val rel = if (d._2 == "en") 1L else 0L
        val term = rel.toDouble * 0.5 * math.pow(0.5, relBefore.toDouble) / (i + 1)
        sum9 += math.floor(term * 1000000000L + 0.5).toLong
        relBefore += rel
      }
      (ranked.length.toLong, math.floor(sum9.toDouble / 1e9 * 1000000 + 0.5) / 1000000)
    }.toMap
    val rows = Registry.byName("q_ret_10_err").fn(spark, sf).collect()
    rows.foreach { r =>
      val (n, err) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == err, s"source ${r.getString(0)}")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    }
  }

  test("q_map_4_value_hist: bucket counts replicate through the map projection") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.min(math.floor(r.getDouble(1) / 50).toLong, 6L)))
    val exp = ev.groupBy(_._1).view.mapValues { es =>
      val counts = es.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      (counts.size.toLong, counts.keys.toSeq.sorted.mkString(","),
        counts.get(0L), counts.get(6L))
    }.toMap
    val rows = Registry.byName("q_map_4_value_hist").fn(spark, sf).collect()
    rows.foreach { r =>
      val (nb, keys, lo, hi) = exp(r.getString(0))
      assert(r.getLong(1) == nb && r.getString(2) == keys)
      assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == lo)
      assert(Option(r.get(4)).map(_.asInstanceOf[Long]) == hi)
    }
  }

  test("q_udaf_3_moments: Aggregator output equals the explicit-sum formula") {
    val o = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) + 0.5).toLong))
    val exp = o.groupBy(_._1).view.mapValues { vs =>
      val n = vs.length.toLong
      val sv = vs.map(_._2).sum
      val svv = vs.map(v => v._2 * v._2).sum
      (n, math.floor(sv.toDouble / n * 10000 + 0.5) / 10000,
        math.floor((n.toDouble * svv - sv.toDouble * sv) / (n.toDouble * n) * 100 + 0.5) / 100)
    }.toMap
    val rows = Registry.byName("q_udaf_3_moments").fn(spark, sf).collect()
    rows.foreach { r =>
      val (n, mean, varp) = exp(r.getString(0))
      assert(r.getLong(1) == n && r.getDouble(2) == mean && r.getDouble(3) == varp)
    }
  }
}
