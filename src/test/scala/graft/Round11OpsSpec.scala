package graft

import org.apache.spark.sql.functions._

/** Round-11 queries replicated against independent driver-side scala
  * computations on the sf0.001 fixture (house style: the oracle gate
  * checks DuckDB agreement; these pins check the MATH).
  */
class Round11OpsSpec extends SparkSpec {

  test("q_graph_27_comp_sizes: histogram equals a driver-side union-find") {
    // rebuild the mod-200 bidirected handoff edges from raw rows
    val rows = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 200 === 0)
      .select(col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        col("l_suppkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // NOTE (l_orderkey, l_linenumber) is NOT unique in the fixture —
    // pair ALL rows at adjacent line numbers, exactly like the join
    val edges = rows.groupBy(_._1).values.flatMap { lines0 =>
      val lines = lines0.toSeq
      for {
        a <- lines; b <- lines
        if b._2 == a._2 + 1 && a._3 != b._3
        e <- Seq((a._3, b._3), (b._3, a._3))
      } yield e
    }.toSet
    val nodes = edges.map(_._1)
    // union-find over the node set
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }; r }
    for ((a, b) <- edges) { val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val sizes = nodes.groupBy(find).map(_._2.size.toLong)
    val hist = sizes.groupBy(identity).map { case (cs, xs) => cs -> xs.size.toLong }
    val total = sizes.sum
    val got = Registry.byName("q_graph_27_comp_sizes").fn(spark, sf).collect()
    assert(got.length == hist.size)
    got.foreach { r =>
      val cs = r.getLong(0)
      assert(r.getLong(1) == hist(cs), s"n_components at size $cs")
      assert(r.getLong(2) == cs * hist(cs), s"n_nodes at size $cs")
      assert(r.getDouble(3) ==
        math.floor(cs.toDouble * hist(cs) / total * 1000000 + 0.5) / 1000000,
        s"node_share at size $cs")
    }
  }

  test("q_time_30_bar_gaps: gaps equal a driver-side resample fold") {
    val ev = graft.sources.Tables(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("tsu"),
        col("event_id").cast("long"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val barUs = 6L * 3600 * 1000000
    val bars = ev.groupBy(e => (e._1, e._2 / barUs * barUs)).map { case ((t, b), xs) =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      def cents(v: Double) = math.floor(v * 100 + 0.5).toLong
      (t, b, cents(sorted.head._4), cents(sorted.last._4)) // open, close
    }.toSeq
    val expected = bars.groupBy(_._1).flatMap { case (t, bs) =>
      val s = bs.sortBy(_._2)
      s.sliding(2).collect { case Seq((_, _, _, pc), (_, b, o, _)) =>
        (t, b, o - pc)
      }
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = Registry.byName("q_time_30_bar_gaps").fn(spark, sf)
      .select(col("event_type"), unix_micros(col("bar")), col("gap_cents"), col("gap"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case ((gt, gb, gc, gg), (et, eb, ec)) =>
      assert(gt == et && gb == eb && gc == ec, s"bar $gt@$gb")
      assert(gg == ec.toDouble / 100, s"gap double at $gt@$gb")
    }
  }

  test("q_dedup_33_lsh_scurve: curve equals a driver-side minhash recomputation") {
    val P = 1000000007L
    def charHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % P)
    def sig(text: String): Seq[Long] = {
      val hs = text.split(" ", -1).distinct.map(charHash)
      (0L until 16L).map(i => hs.map(h => (h * (i * 2 + 3) + (i * 5 + 7)) % P).min)
    }
    val docs = graft.sources.Tables(spark, sf, "documents")
      .filter(col("doc_id") < 100).select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sigs = docs.map { case (id, t) => id -> sig(t) }.toMap
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).distinct.toSet }.toMap
    val ids = docs.map(_._1).sorted
    val rowsExp = (for (a <- ids; b <- ids if a < b) yield {
      val cand = (0 until 4).exists(j =>
        sigs(a).slice(j * 4, j * 4 + 4) == sigs(b).slice(j * 4, j * 4 + 4))
      val jac = toks(a).intersect(toks(b)).size.toDouble / toks(a).union(toks(b)).size
      (math.min(math.floor(jac * 10).toLong, 9L), cand)
    }).groupBy(_._1).map { case (bin, xs) =>
      bin -> (xs.size.toLong, xs.count(_._2).toLong)
    }
    val got = Registry.byName("q_dedup_33_lsh_scurve").fn(spark, sf).collect()
    assert(got.length == rowsExp.size && got.nonEmpty)
    var totPairs = 0L
    got.foreach { r =>
      val (nPairs, nCand) = rowsExp(r.getLong(0))
      assert(r.getLong(1) == nPairs, s"n_pairs at bin ${r.getLong(0)}")
      assert(r.getLong(2) == nCand, s"n_candidates at bin ${r.getLong(0)}")
      assert(r.getDouble(3) ==
        math.floor(nCand.toDouble / nPairs * 1000000 + 0.5) / 1000000)
      totPairs += r.getLong(1)
    }
    // the slice is the full doc_id<100 pair set — nothing dropped
    assert(totPairs == ids.length.toLong * (ids.length - 1) / 2)
  }
}
