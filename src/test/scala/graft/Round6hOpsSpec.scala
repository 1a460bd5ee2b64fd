package graft

import org.apache.spark.sql.functions._

/** Round-6 graph-structure operators: brute-force replications on the
  * sf0.001 sampled handoff graph.
  */
class Round6hOpsSpec extends SparkSpec {

  /** Symmetrized distinct edge list of the l_orderkey % 100 slice. */
  private lazy val edges: Set[(Long, Long)] = {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val byOrder = li.groupBy(_._1)
    val dir = byOrder.values.flatMap { rows =>
      val byLn = rows.groupBy(_._2)
      rows.flatMap { case (_, ln, s) =>
        byLn.getOrElse(ln + 1, Seq.empty)
          .filter(_._3 != s).map(n => (s, n._3))
      }
    }.toSet
    dir.flatMap { case (a, b) => Seq((a, b), (b, a)) }
  }

  private lazy val nbrs: Map[Long, Set[Long]] =
    edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("q_graph_18_labelprop: 3 synchronous rounds replicate with (count desc, label asc) ties") {
    var labels: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.toSeq.map(labels).groupBy(identity)
          .view.mapValues(_.size).toSeq
        n -> counts.minBy { case (lab, c) => (-c, lab) }._1
      }
    }
    val expected = labels.values.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (lab, sz) => (-sz, lab) }.take(20)
      .zipWithIndex.map { case ((lab, sz), i) => (i + 1L, lab, sz) }
    val got = Registry.byName("q_graph_18_labelprop").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q_graph_19_adamic_adar: top-20 scores replicate the quantized-weight sum") {
    val wz: Map[Long, Long] = nbrs.collect { case (n, ns) if ns.size >= 2 =>
      n -> math.floor(1e6 / math.log(ns.size.toDouble) + 0.5).toLong
    }.toMap
    val nodes = nbrs.keys.toSeq.sorted
    val cand = for {
      i <- nodes.indices; j <- i + 1 until nodes.length
      a = nodes(i); b = nodes(j)
      if !edges.contains((a, b))
      common = (nbrs(a) intersect nbrs(b)) if common.nonEmpty
    } yield (a, b, common.size.toLong, common.toSeq.map(wz).sum)
    val expected = cand.sortBy { case (a, b, _, s) => (-s, a, b) }.take(20)
      .zipWithIndex.map { case ((a, b, c, s), i) => (i + 1L, a, b, c, s.toDouble / 1e6) }
    val got = Registry.byName("q_graph_19_adamic_adar").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
  }

  test("q_graph_20_modularity: exact integer arithmetic, contributions sum inside [-1, 1]") {
    val com = graft.sources.Tables(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m2 = edges.size.toLong
    val dirWithin = edges.toSeq.filter { case (a, b) => com(a) == com(b) }
      .groupBy { case (a, _) => com(a) }.view.mapValues(_.size.toLong).toMap
    val degSum = edges.toSeq.groupBy { case (a, _) => com(a) }
      .view.mapValues(_.size.toLong).toMap
    val got = Registry.byName("q_graph_20_modularity").fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (c, dw, ds, contrib) =>
      assert(dw == dirWithin.getOrElse(c, 0L), s"community $c dir_within")
      assert(ds == degSum(c), s"community $c deg_sum")
      val exact = (m2 * dirWithin.getOrElse(c, 0L) - ds * ds).toDouble / (m2 * m2).toDouble
      assert(math.abs(contrib - math.floor(exact * 1e9 + 0.5) / 1e9) < 1e-12)
    }
    val q = got.map(_._4).sum
    assert(q > -1.0 && q < 1.0, s"total modularity $q out of range")
  }
}
