package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11ao): similarity-metric
  * disagreement, IGNORE NULLS window semantics, and principal-axis
  * projection.
  *
  * Determinism discipline (§2.12): both similarity scores quantize to
  * 1e-6 integers before comparison; the carry-forward is an exact
  * last-non-null pick over a total order; projections re-use the
  * quantized power-iteration axis.
  */
object Round5afOps {

  val all: Seq[Q] = Seq(

    // Edit-distance similarity vs Jaro–Winkler on the SAME pairs: count
    // ranking inversions and list the biggest disagreements — the
    // metric-choice audit for q_dedup_8/9 vs q_dedup_24 (prefix-heavy
    // names score high on JW; length-normalized edit distance treats
    // all positions alike).
    Q("q_dedup_25_lev_vs_jaro",
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |pairs AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(floor((1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
        |    / greatest(len(a.p_name), len(b.p_name))) * 1000000 + 0.5) AS BIGINT) AS lev6,
        |  CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000 + 0.5) AS BIGINT) AS jw6
        | FROM names a JOIN names b ON a.p_name < b.p_name)
        |SELECT name_a, name_b, lev6 / 1000000.0 AS lev_sim, jw6 / 1000000.0 AS jw_sim,
        | floor((jw6 - lev6) / 1000000.0 * 1000000 + 0.5) / 1000000 AS disagreement
        |FROM pairs ORDER BY abs(jw6 - lev6) DESC, name_a, name_b LIMIT 15""".stripMargin) { (s, d) =>
      // Both engines' levenshtein builtins agree (integer edit counts);
      // similarity = 1 − lev/maxlen quantized 1e-6 — so the
      // disagreement ranking orders on exact integers.
      graft.expressions.StringExpressions.register(s)
      val names = Tables(s, d, "part").select("p_name").distinct().localCheckpoint()
      val pairs = names.as("a")
        .join(names.as("b"), col("a.p_name") < col("b.p_name"))
        .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          floor((lit(1.0) - levenshtein(col("a.p_name"), col("b.p_name")).cast("double")
            / greatest(length(col("a.p_name")), length(col("b.p_name")))) * 1000000 + 0.5)
            .cast("long").as("lev6"),
          floor(expr("jaro_winkler(a.p_name, b.p_name)") * 1000000 + 0.5).cast("long").as("jw6"))
      pairs.select(col("name_a"), col("name_b"),
          (col("lev6") / 1000000.0).as("lev_sim"), (col("jw6") / 1000000.0).as("jw_sim"),
          (floor((col("jw6") - col("lev6")) / 1000000.0 * 1000000 + 0.5) / 1000000)
            .as("disagreement"),
          abs(col("jw6") - col("lev6")).as("ad"))
        .orderBy(col("ad").desc, col("name_a"), col("name_b")).limit(15).drop("ad")
    },

    // IGNORE NULLS carry-forward: each event also reports the value of
    // the user's LAST NON-ERROR event (error events carry NULL) — the
    // last_value(... IGNORE NULLS) semantics every sessionized
    // attribute join relies on, distinct from plain lag (which would
    // return the NULL itself).
    Q("q_win_26_ignore_nulls",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |  CASE WHEN event_type = 'error' THEN NULL
        |       ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS v
        | FROM events WHERE user_id < 20),
        |w AS (SELECT user_id, event_id,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
        | FROM e)
        |SELECT user_id,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(count(carried) AS BIGINT) AS n_carried,
        | CAST(sum(carried) AS BIGINT) AS carried_cents_sum
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Spark: last(col, ignoreNulls = true) over the same frame —
      // deterministic because the frame order (us, event_id) is total.
      // Events before a user's first non-error value carry NULL
      // (n_carried < n_events exactly when the user's history starts
      // with errors).
      val e = Tables(s, d, "events").filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"),
          when(col("event_type") === "error", lit(null).cast("long"))
            .otherwise(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val carried = e.select(col("user_id"),
        last(col("v"), ignoreNulls = true).over(w).as("carried"))
      carried.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), count("carried").as("n_carried"),
          sum("carried").as("carried_cents_sum"))
        .orderBy("user_id")
    },

    // PC1 projection separation: project every embedding onto the
    // power-iteration axis (q_sim_28's v3) and report per-label mean
    // position — does the TOP variance direction already separate
    // labels, or is label structure orthogonal to it (it usually is
    // for random embeddings — this measures instead of assumes).
    Q("q_sim_32_pca_project",
      """WITH comp AS (SELECT vec_id, label, i.dim,
        |  CAST(floor(CAST(embedding[i.dim] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS c6
        | FROM embeddings, (SELECT unnest(range(1, 65)) AS dim) i),
        |n AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM comp),
        |mu AS (SELECT dim, CAST(sum(c6) AS BIGINT) AS s FROM comp GROUP BY 1),
        |cov AS (SELECT a.dim AS d1, b.dim AS d2,
        |  CAST(floor((CAST(sum(a.c6 * b.c6) AS DOUBLE) * n.n - CAST(ma.s AS DOUBLE) * mb.s)
        |    / (CAST(n.n AS DOUBLE) * n.n) / 1000000.0 + 0.5) AS BIGINT) AS cv6
        | FROM comp a, comp b, mu ma, mu mb, n
        | WHERE a.vec_id = b.vec_id AND ma.dim = a.dim AND mb.dim = b.dim
        | GROUP BY a.dim, b.dim, ma.s, mb.s, n.n),
        |v1 AS (SELECT d1, CAST(sum(cv6) AS BIGINT) AS v FROM cov GROUP BY 1),
        |v2 AS (SELECT cov.d1, CAST(floor(CAST(sum(cov.cv6 * v1.v) AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) AS v
        | FROM cov, v1 WHERE cov.d2 = v1.d1 GROUP BY 1),
        |v3 AS (SELECT cov.d1, CAST(floor(CAST(sum(cov.cv6 * v2.v) AS DOUBLE) / 1000000.0 + 0.5) AS BIGINT) AS v
        | FROM cov, v2 WHERE cov.d2 = v2.d1 GROUP BY 1),
        |nrm AS (SELECT CAST(sum(v * v) AS BIGINT) AS vv FROM v3),
        |proj AS (SELECT comp.vec_id, comp.label,
        |  CAST(sum(comp.c6 * v3.v) AS BIGINT) AS p
        | FROM comp JOIN v3 ON comp.dim = v3.d1 GROUP BY 1, 2)
        |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        | floor(CAST(sum(p) AS DOUBLE) / count(*) / sqrt(nrm.vv) / 1000000 * 10000 + 0.5) / 10000 AS mean_pc1
        |FROM proj, nrm GROUP BY label, nrm.vv ORDER BY label""".stripMargin) { (s, d) =>
      // Reuses q_sim_28's quantized power-iteration axis verbatim (same
      // CTE chain ⇒ identical v3 on both engines); the projection is an
      // exact integer dot product per vector, the per-label sum stays
      // an exact integer, and the axis-norm division happens ONCE per
      // label — no float ever accumulates.
      val comp = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim0", "x")))
        .select(col("vec_id"), col("label"), (col("dim0") + 1).as("dim"),
          floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("c6"))
        .localCheckpoint()
      val n = comp.select(countDistinct("vec_id").as("n"))
      val mu = comp.groupBy(col("dim").as("md")).agg(sum("c6").as("s"))
      val prod = comp.select(col("vec_id"), col("dim").as("d1"), col("c6").as("a6"))
        .join(comp.select(col("vec_id").as("v2id"), col("dim").as("d2"), col("c6").as("b6")),
          col("vec_id") === col("v2id"))
        .groupBy("d1", "d2").agg(sum(col("a6") * col("b6")).as("sab"))
      def D(c0: org.apache.spark.sql.Column) = c0.cast("double")
      val cov = prod
        .join(broadcast(mu.select(col("md").as("m1"), col("s").as("s1"))), col("d1") === col("m1"))
        .join(broadcast(mu.select(col("md").as("m2"), col("s").as("s2"))), col("d2") === col("m2"))
        .crossJoin(broadcast(n))
        .select(col("d1"), col("d2"),
          floor((col("sab").cast("double") * col("n") - D(col("s1")) * col("s2"))
            / (D(col("n")) * col("n")) / 1000000.0 + 0.5).cast("long").as("cv6"))
        .localCheckpoint()
      val v1 = cov.groupBy("d1").agg(sum("cv6").as("v"))
      def step(v: org.apache.spark.sql.DataFrame) =
        cov.join(broadcast(v.select(col("d1").as("vd"), col("v"))), col("d2") === col("vd"))
          .groupBy("d1").agg(floor(sum(col("cv6") * col("v")).cast("double") / 1000000.0 + 0.5)
            .cast("long").as("v"))
      val v3 = step(step(v1))
      val nrm = v3.agg(sum(col("v") * col("v")).as("vv"))
      val proj = comp.join(broadcast(v3.select(col("d1").as("pd"), col("v"))),
          col("dim") === col("pd"))
        .groupBy("vec_id", "label").agg(sum(col("c6") * col("v")).as("p"))
      proj.crossJoin(broadcast(nrm))
        .groupBy(col("label").cast("long").as("label"), col("vv"))
        .agg(count(lit(1)).as("n_vecs"),
          (floor(sum("p").cast("double") / count(lit(1)) / sqrt(col("vv")) / 1000000
            * 10000 + 0.5) / 10000).as("mean_pc1"))
        .drop("vv")
        .orderBy("label")
    }
  )
}
