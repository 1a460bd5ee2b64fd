package graft

import org.apache.spark.sql.functions._

/** PageRank + graph-operator invariants beyond the DuckDB gate:
  * probability-mass conservation (the dangling-mass contract), the
  * convergence-driven mode, and the single-scan plan shapes that keep
  * the iterative queries from re-deriving the fact-table self-join per
  * round (the round-2 perf bug).
  */
class GraphSpec extends SparkSpec {

  import graft.api.Pipelines

  /** Tiny directed graph with a dangling node (4 has no out-edges) and
    * a disconnected-ish tail: exercises both correction terms.
    */
  private def toyEdges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L), (5L, 1L))
      .toDF("src", "dst")
  }

  test("pageRank conserves probability mass (Σ rank ≈ 1) after every iteration count") {
    for (iters <- 1 to 4) {
      val ranks = Pipelines.pageRank(toyEdges, "src", "dst", maxIters = iters)
      val total = ranks.agg(sum("rank")).first().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9,
        s"after $iters iterations Σ rank = $total — dangling mass is leaking")
      assert(ranks.filter(col("rank") <= 0).count() == 0, "ranks must stay positive")
    }
  }

  test("pageRank convergence mode reaches a fixpoint and matches a long fixed run") {
    val converged = Pipelines.pageRank(toyEdges, "src", "dst", maxIters = 100, tol = 1e-12)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val fixed = Pipelines.pageRank(toyEdges, "src", "dst", maxIters = 80)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(converged.map(_._1).sameElements(fixed.map(_._1)))
    converged.zip(fixed).foreach { case ((n, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, s"node $n: converged=$a fixed=$b")
    }
    // the dangling node (4) still holds rank, and the hub (3: two
    // in-edges from the cycle) outranks the leaf feeder (5)
    val m = converged.toMap
    assert(m(4L) > 0.0 && m(3L) > m(5L))
  }

  test("pageRank throws loudly when tol is unreachable in maxIters") {
    intercept[IllegalStateException] {
      Pipelines.pageRank(toyEdges, "src", "dst", maxIters = 1, tol = 1e-15)
    }
  }

  test("q_graph_2_pagerank plan derives the edge list once (no per-iteration fact scans)") {
    val df = Registry.byName("q_graph_2_pagerank").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // all iteration inputs are localCheckpointed: the FINAL plan must
    // contain zero parquet scans of lineitem (round 2 had the
    // edge-derivation subtree 4x in a 368-node plan)
    assert(!plan.contains("lineitem"),
      "pagerank final plan must read checkpointed inputs, not re-derive edges:\n" + plan)
    assert(df.count() > 0)
  }

  test("q_graph_3_twohop plan derives the edge list once") {
    val df = Registry.byName("q_graph_3_twohop").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem"),
      "twohop must reuse one checkpointed edge list across hops:\n" + plan)
    assert(df.count() > 0)
  }
}
