package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation (SURVEY §2.11ax): community structure on the
  * supplier handoff graph — synchronous label propagation, Adamic–Adar
  * link prediction, and exact integer modularity of the nation
  * partition.
  *
  * Determinism discipline (§2.12): label propagation ties break
  * (count DESC, label ASC); Adamic–Adar weights quantize 1/ln(deg) to
  * 1e-6 integers per common neighbor BEFORE the per-pair sum; modularity
  * is exact BIGINT arithmetic with one final int/int double division.
  */
object Round6hOps {

  import Round2Ops.handoffEdges

  /** Sampled symmetrized handoff graph (the q_graph_12/15 fixture
    * slice: l_orderkey % 100 = 0 keeps the graph sparse enough that
    * structure queries discriminate). */
  private def sampledBidir(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val e = handoffEdges(
      Tables(s, d, "lineitem").filter(col("l_orderkey") % 100 === 0)).distinct()
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  private val duckSampledBidir =
    """e0 AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      |  FROM lineitem a JOIN lineitem b
      |   ON a.l_orderkey = b.l_orderkey AND a.l_linenumber + 1 = b.l_linenumber
      |  WHERE a.l_suppkey <> b.l_suppkey AND a.l_orderkey % 100 = 0),
      |b AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)""".stripMargin

  val all: Seq[Q] = Seq(

    // Synchronous label propagation, 3 rounds: every node adopts the
    // most frequent label among its neighbors (ties → smallest label),
    // starting from label = node id. The top-20 community sizes after
    // round 3 are the readout — the cheap community detector that needs
    // no modularity optimization and parallelizes as pure joins.
    Q("q_graph_18_labelprop",
      s"""WITH $duckSampledBidir,
         |r0 AS (SELECT DISTINCT src AS node, src AS lab FROM b),
         |c1 AS (SELECT b.src AS node, l.lab, count(*) AS c FROM b JOIN r0 l ON b.dst = l.node GROUP BY 1, 2),
         |r1 AS (SELECT node, lab FROM (SELECT node, lab, row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rk FROM c1) WHERE rk = 1),
         |c2 AS (SELECT b.src AS node, l.lab, count(*) AS c FROM b JOIN r1 l ON b.dst = l.node GROUP BY 1, 2),
         |r2 AS (SELECT node, lab FROM (SELECT node, lab, row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rk FROM c2) WHERE rk = 1),
         |c3 AS (SELECT b.src AS node, l.lab, count(*) AS c FROM b JOIN r2 l ON b.dst = l.node GROUP BY 1, 2),
         |r3 AS (SELECT node, lab FROM (SELECT node, lab, row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rk FROM c3) WHERE rk = 1)
         |SELECT CAST(row_number() OVER (ORDER BY sz DESC, community) AS BIGINT) AS rank,
         | community, sz AS size
         |FROM (SELECT lab AS community, CAST(count(*) AS BIGINT) AS sz FROM r3 GROUP BY 1)
         |ORDER BY rank LIMIT 20""".stripMargin) { (s, d) =>
      // Each round is one (edges ⋈ labels) shuffle + a per-node window —
      // the Pregel superstep as declarative joins. Labels checkpoint per
      // round (lineage stays O(1)); the label table is node-sized, so at
      // 1000 executors the join broadcasts while the edge list never
      // moves. Synchronous + deterministic tie-break ⇒ the fixpoint
      // trajectory is reproducible across any partitioning.
      val b = sampledBidir(s, d).localCheckpoint()
      var labels = b.select(col("src").as("node")).distinct()
        .withColumn("lab", col("node")).localCheckpoint()
      for (_ <- 1 to 3) {
        val cnt = b.join(labels.withColumnRenamed("node", "nbr"), col("dst") === col("nbr"))
          .groupBy(col("src").as("node"), col("lab")).agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("node").orderBy(col("c").desc, col("lab"))
        labels = cnt.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select("node", "lab").localCheckpoint()
      }
      val sizes = labels.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("size"))
      // TakeOrdered top-20, then the rank window over just 20 rows
      sizes.orderBy(col("size").desc, col("community")).limit(20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("size").desc, col("community"))).cast("long"))
        .select("rank", "community", "size")
        .orderBy("rank")
    },

    // Adamic–Adar link prediction: for non-adjacent pairs sharing ≥1
    // neighbor, score = Σ_z 1/ln(deg(z)) over common neighbors z — the
    // classic "who should be connected" feature that discounts hub
    // intermediaries (a shared rare neighbor says more than a shared
    // hub). Top-20 candidate pairs.
    Q("q_graph_19_adamic_adar",
      s"""WITH $duckSampledBidir,
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS dg FROM b GROUP BY 1),
         |w AS (SELECT node, CAST(floor(1000000 / ln(CAST(dg AS DOUBLE)) + 0.5) AS BIGINT) AS wz
         |      FROM deg WHERE dg >= 2),
         |cand AS (SELECT x.src AS a, y.src AS bb, CAST(count(*) AS BIGINT) AS n_common,
         |         CAST(sum(w.wz) AS BIGINT) AS score6
         |  FROM b x JOIN b y ON x.dst = y.dst AND x.src < y.src
         |  JOIN w ON w.node = x.dst
         |  WHERE NOT EXISTS (SELECT 1 FROM b e WHERE e.src = x.src AND e.dst = y.src)
         |  GROUP BY 1, 2)
         |SELECT CAST(row_number() OVER (ORDER BY score6 DESC, a, bb) AS BIGINT) AS rank,
         | a, bb AS b, n_common, CAST(score6 AS DOUBLE) / 1000000 AS score
         |FROM cand ORDER BY rank LIMIT 20""".stripMargin) { (s, d) =>
      // Candidate pairs come from the wedge join (per shared neighbor —
      // O(Σ deg²), the triangle-counting shape, never all-pairs); the
      // 1/ln(deg) weight quantizes to a 1e-6 integer PER NEIGHBOR so the
      // per-pair sum is exact whatever the shuffle order. deg(z) ≥ 2 for
      // every common neighbor (z touches both a and b), but the weight
      // table computes eagerly for ALL nodes — the dg >= 2 guard keeps
      // ln(1) = 0 out of the divisor (ANSI mode would throw before the
      // join ever filtered it). Adjacent pairs drop via an anti join.
      val b = sampledBidir(s, d).localCheckpoint()
      val w = b.groupBy(col("src").as("node")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= 2)
        .select(col("node"),
          floor(lit(1000000) / log(col("dg").cast("double")) + 0.5).cast("long").as("wz"))
      val cand = b.as("x").join(b.as("y"),
          col("x.dst") === col("y.dst") && col("x.src") < col("y.src"))
        .select(col("x.src").as("a"), col("y.src").as("bb"), col("x.dst").as("z"))
        .join(b.select(col("src").as("ea"), col("dst").as("eb")),
          col("a") === col("ea") && col("bb") === col("eb"), "left_anti")
        // w is node-scaled — no broadcast hint (forced broadcast fails
        // at 10⁸⁺ nodes; AQE picks broadcast vs shuffle from its size)
        .join(w, col("z") === col("node"))
        .groupBy("a", "bb")
        .agg(count(lit(1)).as("n_common"), sum("wz").as("score6"))
      // TakeOrdered top-20 over the candidate-pair table (which scales
      // with wedge count), then the rank window over just 20 rows
      cand.orderBy(col("score6").desc, col("a"), col("bb")).limit(20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score6").desc, col("a"), col("bb"))).cast("long"))
        .select(col("rank"), col("a"), col("bb").as("b"), col("n_common"),
          (col("score6").cast("double") / 1000000).as("score"))
        .orderBy("rank")
    },

    // Modularity of the nation partition: does the org chart (supplier
    // nationality) explain the handoff graph's community structure?
    // Q_c = (m2·dir_c − d_c²) / m2² per community c, where m2 = total
    // directed edges, dir_c = directed edges inside c, d_c = degree sum
    // of c — the halving-free form of e_c/m − (d_c/2m)². Positive
    // contribution = denser inside than chance.
    Q("q_graph_20_modularity",
      s"""WITH $duckSampledBidir,
         |com AS (SELECT s_suppkey AS node, s_nationkey AS c FROM supplier),
         |m2t AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM b),
         |within AS (SELECT ca.c, CAST(count(*) AS BIGINT) AS dir_within
         |  FROM b JOIN com ca ON b.src = ca.node JOIN com cb ON b.dst = cb.node
         |  WHERE ca.c = cb.c GROUP BY 1),
         |degsum AS (SELECT com.c, CAST(count(*) AS BIGINT) AS deg_sum
         |  FROM b JOIN com ON b.src = com.node GROUP BY 1)
         |SELECT ds.c AS community, n.n_name, COALESCE(w.dir_within, CAST(0 AS BIGINT)) AS dir_within,
         | ds.deg_sum,
         | floor(CAST(m2 * COALESCE(w.dir_within, CAST(0 AS BIGINT)) - ds.deg_sum * ds.deg_sum AS DOUBLE)
         |   / CAST(m2 * m2 AS DOUBLE) * 1000000000 + 0.5) / 1000000000 AS contribution
         |FROM degsum ds LEFT JOIN within w ON ds.c = w.c
         | JOIN nation n ON ds.c = n.n_nationkey CROSS JOIN m2t
         |ORDER BY community""".stripMargin) { (s, d) =>
      // Exact BIGINT end-to-end: dir_within and deg_sum are counts, the
      // numerator m2·dir_c − d_c² stays under 2⁶³ for any graph whose
      // directed edge count fits an int (m2² ≤ 8e18 at m2 ≈ 2.8e9 —
      // far above any sampled fixture), and the single int/int double
      // division is correctly rounded on both engines. Shuffles are
      // keyed by community — |nations| groups regardless of edges.
      val b = sampledBidir(s, d).localCheckpoint()
      val com = Tables(s, d, "supplier")
        .select(col("s_suppkey").as("node"), col("s_nationkey").as("c"))
      val m2 = b.agg(count(lit(1)).as("m2"))
      // com is one row per node — never force-broadcast a node-scaled
      // table (hard failure at 10⁸⁺ nodes); AQE sizes these joins.
      val within = b
        .join(com.select(col("node").as("na"), col("c").as("ca")), col("src") === col("na"))
        .join(com.select(col("node").as("nb"), col("c").as("cb")), col("dst") === col("nb"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).as("dir_within"))
      val degsum = b.join(com, col("src") === col("node"))
        .groupBy("c").agg(count(lit(1)).as("deg_sum"))
      val nation = Tables(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      degsum.join(within, Seq("c"), "left")
        .join(broadcast(nation), col("c") === col("n_nationkey"))
        .crossJoin(broadcast(m2))
        .select(col("c").as("community"), col("n_name"),
          coalesce(col("dir_within"), lit(0L)).as("dir_within"), col("deg_sum"),
          (floor(
            (col("m2") * coalesce(col("dir_within"), lit(0L))
              - col("deg_sum") * col("deg_sum")).cast("double")
              / (col("m2") * col("m2")).cast("double") * 1000000000 + 0.5) / 1000000000)
            .as("contribution"))
        .orderBy("community")
    }
  )
}
