package graft

import org.apache.spark.sql.functions._

/** Round-7 graph operators: brute-force replications on sf0.001. */
class Round7eOpsSpec extends SparkSpec {

  private def bidir(mod: Int): Array[(Long, Long)] = {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") % mod === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byOrder: Map[Long, Seq[(Long, Int, Long)]] =
      li.toSeq.groupBy(_._1)
    val e: Set[(Long, Long)] = byOrder.values.flatMap { ls =>
      val byLn: Map[Int, Seq[(Long, Int, Long)]] = ls.groupBy(_._2)
      ls.flatMap { a =>
        byLn.getOrElse(a._2 + 1, Seq.empty)
          .filter(_._3 != a._3).map(b => (a._3, b._3))
      }
    }.toSet
    (e ++ e.map(p => (p._2, p._1))).toArray
  }

  test("q_graph_21_rich_club: degrees, hub set and densities replicate") {
    val b = bidir(20)
    val deg = b.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    val nh = math.max(n / 10, 2L)
    val hubs = deg.toSeq.sortBy { case (node, dg) => (-dg, node) }.take(nh.toInt)
      .map(_._1).toSet
    val e2 = b.length.toLong
    val eh2 = b.count(p => hubs(p._1) && hubs(p._2)).toLong
    val r = Registry.byName("q_graph_21_rich_club").fn(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n, nh, e2 / 2, eh2 / 2)))
    val ratio = (eh2.toDouble / (nh * (nh - 1))) / (e2.toDouble / (n * (n - 1)))
    assert(r.getDouble(6) == math.floor(ratio * 10000 + 0.5) / 10000)
  }

  test("q_graph_22_hub_knockout: union-find replication of both scenarios") {
    val b = bidir(200)
    val nodes = b.map(_._1).distinct.sorted
    val deg = b.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nh = math.max(nodes.length / 100, 1)
    val hubs = deg.toSeq.sortBy { case (node, dg) => (-dg, node) }.take(nh)
      .map(_._1).toSet
    def components(ns: Array[Long], es: Array[(Long, Long)]): Map[Long, Int] = {
      val parent = scala.collection.mutable.Map(ns.map(x => x -> x): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (u, v) => val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(ru) = rv }
      ns.groupBy(find).map { case (root, members) => root -> members.length }
    }
    val c0 = components(nodes, b)
    val survivors = nodes.filterNot(hubs)
    val b1 = b.filter(p => !hubs(p._1) && !hubs(p._2))
    val c1 = components(survivors, b1)
    val rows = Registry.byName("q_graph_22_hub_knockout").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows(0) == (("a_original", nodes.length.toLong, c0.size.toLong,
      c0.values.max.toLong)))
    assert(rows(1) == (("b_hubs_removed", survivors.length.toLong, c1.size.toLong,
      c1.values.max.toLong)))
  }

  test("q_graph_23_degree_gini: rank-weighted formula replicates; gini in [0,1)") {
    val b = bidir(1)
    val deg = b.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (node, dg) => (dg, node) }
    val n = deg.length.toLong
    val sd = deg.map(_._2).sum
    val sid = deg.zipWithIndex.map { case ((_, dg), i) => (i + 1) * dg }.sum
    val gini = (2.0 * sid - (n + 1).toDouble * sd) / (n.toDouble * sd)
    val r = Registry.byName("q_graph_23_degree_gini").fn(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == sd)
    assert(r.getDouble(3) == math.floor(gini * 1000000 + 0.5) / 1000000)
    assert(r.getDouble(3) >= 0 && r.getDouble(3) < 1)
  }
}
