package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-7 continuation (SURVEY §2.11bj): the recursive-CTE SQL
  * surface — Spark 4.1's `WITH RECURSIVE` (UnionLoopExec) run against
  * DuckDB's recursion on the identical SQL shape.
  *
  * Determinism discipline (§2.12): bounded-depth UNION ALL recursion
  * (every path enumerated at most once per level; the level bound, not
  * engine fixpoint detection, terminates both engines), exact integer
  * path/node counts, total ORDER BY.
  */
object Round7jOps {

  val all: Seq[Q] = Seq(

    // Bounded transitive closure via WITH RECURSIVE on the sampled
    // handoff graph: path and distinct-node counts per hop from the
    // minimum supplier node. The declared queries elsewhere drive
    // iteration from Scala (q_graph_6's frontier loop); this is the
    // same semantics expressed IN SQL and planned by the engine's own
    // recursion operator (UnionLoopExec) — the capability check that a
    // SQL-string user can run hierarchy walks without host-language
    // loops.
    Q("q_graph_24_recursive_sql",
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_linenumber + 1 = b.l_linenumber
        |  WHERE a.l_suppkey <> b.l_suppkey AND a.l_orderkey % 200 = 0),
        |bidir AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |seed AS (SELECT min(src) AS s FROM bidir),
        |walk(node, lvl) AS (
        |  SELECT s, 0 FROM seed
        |  UNION ALL
        |  SELECT b.dst, w.lvl + 1 FROM walk w JOIN bidir b ON b.src = w.node
        |  WHERE w.lvl < 3)
        |SELECT CAST(lvl AS BIGINT) AS lvl,
        | CAST(count(*) AS BIGINT) AS n_paths,
        | CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
        |FROM walk GROUP BY lvl ORDER BY lvl""".stripMargin) { (s, d) =>
      // The recursive member re-joins the frontier against the edge
      // list each round — Spark plans it as UnionLoopExec over the
      // same hash join a hand-written loop would issue; the lvl < 3
      // bound caps the loop at 4 iterations regardless of cycles.
      // Scale note: path counts grow with degree^depth — bounded-depth
      // UNION ALL is for SHALLOW walks; deep closure belongs to the
      // large-star/small-star machinery (Pipelines.connectedComponents).
      Tables(s, d, "lineitem").createOrReplaceTempView("lineitem_rec")
      s.sql("""WITH RECURSIVE e AS (
        |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |  FROM lineitem_rec a JOIN lineitem_rec b
        |   ON a.l_orderkey = b.l_orderkey AND a.l_linenumber + 1 = b.l_linenumber
        |  WHERE a.l_suppkey <> b.l_suppkey AND a.l_orderkey % 200 = 0),
        |bidir AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |seed AS (SELECT min(src) AS s FROM bidir),
        |walk(node, lvl) AS (
        |  SELECT s, 0 FROM seed
        |  UNION ALL
        |  SELECT b.dst, w.lvl + 1 FROM walk w JOIN bidir b ON b.src = w.node
        |  WHERE w.lvl < 3)
        |SELECT CAST(lvl AS BIGINT) AS lvl,
        | CAST(count(*) AS BIGINT) AS n_paths,
        | CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
        |FROM walk GROUP BY lvl ORDER BY lvl""".stripMargin)
    }
  )
}
