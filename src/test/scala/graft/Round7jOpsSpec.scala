package graft

import org.apache.spark.sql.functions._

/** Round-7j: the recursive-CTE SQL surface. */
class Round7jOpsSpec extends SparkSpec {

  test("q_graph_24_recursive_sql: BFS path counts replicate; plan uses the engine's recursion operator") {
    // brute-force bounded walk on the collected sampled graph
    val li = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 200 === 0)
      .select("l_orderkey", "l_linenumber", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byOrder: Map[Long, Seq[(Long, Int, Long)]] = li.toSeq.groupBy(_._1)
    val e: Set[(Long, Long)] = byOrder.values.flatMap { ls =>
      val byLn: Map[Int, Seq[(Long, Int, Long)]] = ls.groupBy(_._2)
      ls.flatMap(a => byLn.getOrElse(a._2 + 1, Seq.empty)
        .filter(_._3 != a._3).map(b => (a._3, b._3)))
    }.toSet
    val bidir = (e ++ e.map(p => (p._2, p._1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val seed = bidir.keys.min
    var frontier = Seq(seed)
    val exp = scala.collection.mutable.ArrayBuffer((0L, 1L, 1L))
    for (lvl <- 1 to 3) {
      frontier = frontier.flatMap(n => bidir.getOrElse(n, Seq.empty))
      exp += ((lvl.toLong, frontier.length.toLong, frontier.distinct.length.toLong))
    }
    val got = Registry.byName("q_graph_24_recursive_sql").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
    // plan evidence: Spark executes the recursion with its own loop
    // operator, not a host-language driver loop
    val plan = Registry.byName("q_graph_24_recursive_sql").fn(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoop"), plan.take(600))
  }
}
