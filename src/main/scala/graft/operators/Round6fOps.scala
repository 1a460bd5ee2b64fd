package graft.operators

import graft.Q
import graft.sources.Tables
import graft.functions.VectorFunctions.Duck
import org.apache.spark.sql.functions._

/** Round-6 continuation (SURVEY §2.11av): corpus provenance and
  * training-mix planning — the cross-source duplication matrix, a
  * data-constrained epoch planner, and the embedding-dedup threshold
  * sensitivity table.
  *
  * Determinism discipline (§2.12): overlaps are exact distinct counts;
  * the epoch planner is integer arithmetic with one quantized rational
  * at emission; threshold compares hit identically-computed doubles
  * (the q_sim_2 fold-order argument).
  */
object Round6fOps {

  val all: Seq[Q] = Seq(

    // Cross-source duplication matrix: how many DISTINCT texts each
    // pair of sources shares verbatim — the provenance audit behind
    // every corpus-mixing decision (if two feeds are 30% the same,
    // their mixture weights double-count). q_dedup_1 collapses dups;
    // this says WHERE they come from.
    Q("q_text_51_source_overlap",
      """WITH ds AS (SELECT DISTINCT source, text FROM documents)
        |SELECT a.source AS source_a, b.source AS source_b,
        | CAST(count(*) AS BIGINT) AS shared_texts
        |FROM ds a JOIN ds b ON a.text = b.text AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // (source, text) dedups once; the pair join is keyed by the text
      // itself (at 100 TB: by xxhash64 digest — 8-byte keys, and the
      // per-text source fan-in is |sources|-bounded so the pair
      // explosion is quadratic only in that small constant).
      val ds = Tables(s, d, "documents")
        .select(col("source"), col("text")).distinct().localCheckpoint()
      ds.as("a")
        .join(ds.as("b"),
          col("a.text") === col("b.text") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("shared_texts"))
        .orderBy("source_a", "source_b")
    },

    // Data-constrained epoch planner: serve a token target of 3× the
    // corpus under per-source repetition caps (4 epochs for
    // above-median-length sources, 2 below — the "repeat quality more"
    // rule). Capped sources serve cap×tokens; the residual target
    // spreads over uncapped sources as a single rational epoch rate.
    // This is the mixture-planning step AFTER q_pipe_4's budget split:
    // water-filling allocates a budget; this plans repetitions when
    // the budget EXCEEDS the data.
    Q("q_pipe_5_epoch_plan",
      """WITH src AS (SELECT source, CAST(sum(n_chars // 5) AS BIGINT) AS toks,
        |  CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |med AS (SELECT CAST(floor(median(toks * 1.0 / n_docs)) AS BIGINT) AS m FROM src),
        |capped AS (SELECT source, toks, n_docs,
        |  CAST(CASE WHEN toks / n_docs >= m THEN 4 ELSE 2 END AS BIGINT) AS cap
        | FROM src, med),
        |tot AS (SELECT CAST(sum(toks) * 3 AS BIGINT) AS target FROM capped),
        |r1 AS (SELECT c.source, c.toks, c.cap, t.target,
        |  CASE WHEN c.cap <= 3 THEN c.cap * c.toks ELSE CAST(0 AS BIGINT) END AS served_capped
        | FROM capped c, tot t),
        |pool AS (SELECT CAST(min(target) - sum(served_capped) AS BIGINT) AS residual,
        |  CAST(sum(CASE WHEN cap > 3 THEN toks ELSE 0 END) AS BIGINT) AS free_toks FROM r1),
        |fin AS (SELECT r1.source, r1.toks, r1.cap,
        |  CASE WHEN r1.cap <= 3 THEN r1.cap * 1000
        |   ELSE least(CAST(r1.cap * 1000 AS BIGINT),
        |     CAST(floor(CAST(p.residual AS DOUBLE) * 1000 / p.free_toks) AS BIGINT)) END AS epochs3
        | FROM r1, pool p)
        |SELECT source, toks AS tokens, cap AS epoch_cap,
        | epochs3 / 1000.0 AS epochs,
        | CAST(epochs3 * toks // 1000 AS BIGINT) AS tokens_served
        |FROM fin ORDER BY source""".stripMargin) { (s, d) =>
      // Everything is integer until the single residual/free_toks
      // rational, which quantizes to 1e-3 epochs BEFORE computing
      // tokens_served (so both engines floor the same value). Two
      // 1-row barriers (median/target, residual pool), both broadcast.
      val src = Tables(s, d, "documents")
        .groupBy("source")
        .agg(sum(expr("n_chars div 5")).as("toks"), count(lit(1)).as("n_docs"))
        .localCheckpoint()
      val med = src.agg(
        floor(expr("median(toks * 1.0 / n_docs)")).cast("long").as("m"))
      val capped = src.crossJoin(broadcast(med))
        .select(col("source"), col("toks"), col("n_docs"),
          when(col("toks") / col("n_docs") >= col("m"), 4L).otherwise(2L).as("cap"))
      val tot = capped.agg((sum("toks") * 3).as("target"))
      val r1 = capped.crossJoin(broadcast(tot))
        .select(col("source"), col("toks"), col("cap"), col("target"),
          when(col("cap") <= 3, col("cap") * col("toks")).otherwise(0L).as("served_capped"))
        .localCheckpoint()
      val pool = r1.agg((min("target") - sum("served_capped")).as("residual"),
        sum(when(col("cap") > 3, col("toks")).otherwise(0L)).as("free_toks"))
      r1.crossJoin(broadcast(pool))
        .select(col("source"), col("toks").as("tokens"), col("cap").as("epoch_cap"),
          when(col("cap") <= 3, col("cap") * 1000L)
            .otherwise(least(col("cap") * 1000L,
              floor(col("residual").cast("double") * 1000 / col("free_toks")).cast("long")))
            .as("epochs3"))
        .select(col("source"), col("tokens"), col("epoch_cap"),
          (col("epochs3") / 1000.0).as("epochs"),
          expr("epochs3 * tokens div 1000").as("tokens_served"))
        .orderBy("source")
    },

    // Embedding-dedup threshold sensitivity: how many candidate pairs
    // survive at each cosine cutoff — the table that picks the
    // semantic-dedup threshold (q_sim_5 ranks the top pairs; q_sim_13
    // applies ONE threshold; this shows the whole curve, where the
    // knee is, and how much the corpus shrinks per step).
    Q("q_sim_34_threshold_sweep",
      s"""WITH pairs AS (
         | SELECT ${Duck.cosine("a.embedding", "b.embedding")} AS cos
         | FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         | WHERE a.vec_id < 60 AND b.vec_id < 60),
         |t AS (SELECT unnest([50, 60, 70, 80, 90]) AS thr),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM pairs)
         |SELECT CAST(t.thr AS BIGINT) AS threshold_pct,
         | CAST((SELECT count(*) FROM pairs WHERE cos >= t.thr / 100.0) AS BIGINT) AS n_pairs,
         | floor(CAST((SELECT count(*) FROM pairs WHERE cos >= t.thr / 100.0) AS DOUBLE)
         |   / n.total * 1000000 + 0.5) / 1000000 AS pair_share
         |FROM t, n ORDER BY threshold_pct""".stripMargin) { (s, d) =>
      // Same demonstration bound as q_sim_5 (60 vectors; the scale
      // path is LSH/IVF blocking before the pairwise pass). The five
      // cutoffs evaluate as conditional sums over ONE materialized
      // pair table — the cosines are computed once, not per threshold.
      graft.expressions.VectorExpressions.register(s)
      val e = Tables(s, d, "embeddings").filter(col("vec_id") < 60)
      val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
      val pairs = a.join(b, col("ia") < col("ib"))
        .select(expr("cosine_similarity(va, vb)").as("cos"))
        .localCheckpoint()
      val thr = s.range(5, 10).select((col("id") * 10).as("threshold_pct"))
      pairs.crossJoin(broadcast(thr))
        .groupBy("threshold_pct")
        .agg(sum(when(col("cos") >= col("threshold_pct") / 100.0, 1L).otherwise(0L)).as("n_pairs"),
          count(lit(1)).as("__total"))
        .select(col("threshold_pct"), col("n_pairs"),
          (floor(col("n_pairs").cast("double") / col("__total") * 1000000 + 0.5) / 1000000)
            .as("pair_share"))
        .orderBy("threshold_pct")
    }
  )
}
