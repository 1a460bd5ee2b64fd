package graft

/** Round-7v structure wave: brute-force replications on sf0.001. */
class Round7vOpsSpec extends SparkSpec {

  private def rnd(x: Double, s: Int): Double = {
    val m = math.pow(10, s); math.floor(x * m + 0.5) / m
  }
  private def c2(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  test("q_graph_25_diameter_sweep: two-sweep bound replicates an in-memory BFS") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_orderkey") % 200 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byOrder = li.toSeq.groupBy(_._1)
    val edges: Set[(Long, Long)] = byOrder.values.toSeq.flatMap { rows =>
      val byLn = rows.groupBy(_._2)
      rows.flatMap { a =>
        byLn.getOrElse(a._2 + 1, Seq.empty)
          .filter(_._3 != a._3)
          .flatMap(b => Seq((a._3, b._3), (b._3, a._3)))
      }
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = edges.map(_._1)
    def bfs2(root: Long): Map[Long, Long] = {
      var dist = Map(root -> 0L); var frontier = Set(root); var lvl = 0L
      while (frontier.nonEmpty) {
        lvl += 1
        val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(dist.contains)
        nxt.foreach(n => dist += n -> lvl)
        frontier = nxt
      }
      dist
    }
    val root = nodes.min
    val d1 = bfs2(root)
    val far = d1.toSeq.sortBy(kv => (-kv._2, kv._1)).head
    val d2 = bfs2(far._1)
    val got = Registry.byName("q_graph_25_diameter_sweep").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == far._1)
    assert(got.getLong(1) == far._2)
    assert(got.getLong(2) == d2.values.max)
    assert(got.getLong(3) == d2.size.toLong)
    assert(got.getLong(2) >= got.getLong(1), "sweep bound never shrinks")
  }

  test("q_stream_42_load_percentiles: rank picks replicate") {
    import org.apache.spark.sql.functions.{col, date_trunc, count, lit}
    val hours = graft.sources.Tables(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
    val xs = hours.sortBy(identity).map(_._2)
    val sorted = hours.sortBy(h => (h._2, h._1)).map(_._2)
    val nh = sorted.length
    def pick(num: Int, den: Int) = sorted((num * nh + num) / den - 1)
    val got = Registry.byName("q_stream_42_load_percentiles").fn(spark, sf).collect()(0)
    assert(got.getLong(0) == nh.toLong)
    assert(got.getLong(1) == pick(1, 2))
    assert(got.getLong(2) == pick(9, 10))
    assert(got.getLong(3) == pick(99, 100))
    assert(got.getLong(4) == xs.max)
    assert(got.getDouble(5) == rnd(xs.max.toDouble / pick(1, 2), 6))
  }

  test("q_join_25_struct_key: struct equality equals two-column equality with multiplicity") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getDouble(4).toLong))
    val left = li.filter(_._3 == "R")
    val right = li.filter(_._4 == "F")
    val rightByKey = right.groupBy(r => (r._1, r._2)).view.mapValues(_.size.toLong).toMap
    val matches = left.flatMap { l =>
      rightByKey.get((l._1, l._2)).map(m => (m, l._5 * m))
    }
    val expN = matches.map(_._1).sum
    val expQ = matches.map(_._2).sum
    val got = Registry.byName("q_join_25_struct_key").fn(spark, sf).collect()
    assert(got.length == 1)
    assert(got(0).getLong(2) == expN)
    assert(got(0).getLong(3) == expQ)
  }

  test("q_udtf_5_json_tuple: generator round trip inverts construction") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .select("event_type", "value", "user_id").collect()
      .map(r => (r.getString(0), c2(r.getDouble(1)), r.getLong(2)))
    val exp = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (et, rs) =>
      (et, rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).distinct.size.toLong)
    }
    val got = Registry.byName("q_udtf_5_json_tuple").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_mm_13_page_manifest: ceiling-division page math replicates") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).getBytes("UTF-8").length.toLong))
    val exp = docs.map(_._1).distinct.sorted.map { src =>
      val lens = docs.filter(_._1 == src).map(_._2)
      val pages = lens.map(l => (l + 63) / 64)
      val lastFill = lens.zip(pages).map { case (l, p) => l - (p - 1) * 64 }
      (src, lens.length.toLong, pages.sum, pages.max, lastFill.sum,
        pages.sum * 64 - lens.sum)
    }
    val got = Registry.byName("q_mm_13_page_manifest").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp.toSeq)
  }
}
