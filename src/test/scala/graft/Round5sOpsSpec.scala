package graft

import org.apache.spark.sql.functions._

/** Round-5s operators: brute-force Scala replications of the graph
  * extensions over the collected sf0.001 handoff graph.
  */
class Round5sOpsSpec extends SparkSpec {

  /** Undirected (symmetrized, distinct) handoff adjacency. */
  private lazy val adj: Map[Long, Set[Long]] = {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byOrder = li.groupBy(_._1)
    val edges = byOrder.values.flatMap { ls =>
      // l_linenumber is NOT unique per order in the fixtures: join ALL
      // (ln, ln+1) supplier combinations like the equi-join does
      val m: Map[Int, Seq[Long]] =
        ls.groupBy(_._2).view.mapValues(_.map(_._3).toSeq).toMap
      m.toSeq.flatMap { case (ln, s1s) =>
        m.getOrElse(ln + 1, Seq.empty[Long])
          .flatMap(s2 => s1s.filter(_ != s2).map(s1 => (s1, s2)))
      }
    }.toSet
    val bidir = edges ++ edges.map(e => (e._2, e._1))
    bidir.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  /** Same adjacency on the l_orderkey % 100 = 0 sampled graph (the
    * kcore/closeness fixture slice — the full graph is too dense for a
    * 3-core peel to discriminate). */
  private lazy val sampledAdj: Map[Long, Set[Long]] = {
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val edges = li.groupBy(_._1).values.flatMap { ls =>
      val m: Map[Int, Seq[Long]] =
        ls.groupBy(_._2).view.mapValues(_.map(_._3).toSeq).toMap
      m.toSeq.flatMap { case (ln, s1s) =>
        m.getOrElse(ln + 1, Seq.empty[Long])
          .flatMap(s2 => s1s.filter(_ != s2).map(s1 => (s1, s2)))
      }
    }.toSet
    (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("q_graph_12_kcore: peel trajectory replicates; monotone nonincreasing") {
    var a = sampledAdj
    val expected = (1 to 3).map { _ =>
      val keep = a.collect { case (v, ns) if ns.size >= 3 => v }.toSet
      a = a.collect { case (v, ns) if keep(v) =>
        v -> ns.filter(keep)
      }.filter(_._2.nonEmpty)
      // survivors by degree BEFORE re-filter; edges among survivors
      val nEdges = a.values.map(_.size).sum / 2
      (keep.size.toLong, nEdges.toLong)
    }
    val got = Registry.byName("q_graph_12_kcore").fn(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
    assert(got.map(_._1).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q_graph_13_hits: authority/hub scores normalized and the top node has in-links") {
    val rows = Registry.byName("q_graph_13_hits").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 10)
    // scores are valid L1-normalized fractions
    assert(rows.forall(r => r._2 > 0 && r._2 <= 1 && r._3 >= 0 && r._3 <= 1))
    // sorted by authority descending
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // the top authority must actually have incoming handoff edges
    val inNbrs = adj.getOrElse(rows.head._1, Set.empty)
    assert(inNbrs.nonEmpty)
  }

  test("q_graph_14_bipartite: shared-part weights replicate") {
    val ps = graft.sources.Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val weights = ps.groupBy(_._1).values.flatMap { sup =>
      val sks = sup.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- i + 1 until sks.length) yield (sks(i), sks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = weights.toSeq.sortBy { case ((a, b), w) => (-w, a, b) }.take(20)
      .map { case ((a, b), w) => (a, b, w) }
    val got = Registry.byName("q_graph_14_bipartite").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }

  test("q_graph_15_closeness: layer counts replicate BFS ball sizes on the sampled graph") {
    // the query runs on the l_orderkey % 100 = 0 sampled handoff graph
    val sadj = sampledAdj
    val expected = sadj.keys.map { v =>
      val l1 = sadj(v)
      val l2 = l1.flatMap(sadj.getOrElse(_, Set.empty)) -- l1 - v
      val l3 = l2.flatMap(sadj.getOrElse(_, Set.empty)) -- l1 -- l2 - v
      v -> ((l1.size.toLong, l2.size.toLong, l3.size.toLong))
    }.toMap
    val got = Registry.byName("q_graph_15_closeness").fn(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    got.foreach { case (v, ls) => assert(expected(v) == ls, s"node $v") }
    // ranking respects the exact integer harmonic score
    val scores = got.map { case (_, (n1, n2, n3)) => n1 * 1000000L + n2 * 500000L + n3 * 333333L }
    assert(scores.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }
}
