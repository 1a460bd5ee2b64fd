package graft.operators

import graft.Q
import graft.functions.Num.round
import graft.functions.VectorFunctions.Duck
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11aa): model-building primitives —
  * two-regressor OLS via Cramer's rule, a decision stump over a fixed
  * threshold grid, Matryoshka prefix-dimension retrieval agreement,
  * per-label diagonal-Mahalanobis outliers, and the covariance top
  * eigenvector by unrolled power iteration.
  *
  * Determinism discipline (§2.12): regression/eigen moments accumulate
  * as exact BIGINTs (values pre-quantized); matrix/vector entries
  * re-quantize after EVERY iteration step so each engine feeds the next
  * step bit-identical doubles; argmins/argmaxes order on quantized
  * integers with id tie-breaks.
  */
object Round5rOps {

  val all: Seq[Q] = Seq(

    // Two-regressor OLS: price ~ quantity + discount, closed-form via
    // Cramer's rule on the 3×3 normal equations — the multi-feature
    // step beyond q_stat_5's simple regression (discount is a confound
    // there; here it gets its own coefficient).
    Q("q_ml_8_ols_multi",
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |  CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sz,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sxz,
        |  CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) AS szz,
        |  CAST(sum(CAST(l_quantity AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
        |  CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS szy
        | FROM lineitem),
        |det AS (SELECT n, sx, sz, sy, sxx, sxz, szz, sxy, szy,
        |  CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) * szz - CAST(sxz AS DOUBLE) * sxz)
        |   - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) * szz - CAST(sxz AS DOUBLE) * sz)
        |   + CAST(sz AS DOUBLE) * (CAST(sx AS DOUBLE) * sxz - CAST(sxx AS DOUBLE) * sz) AS dd
        | FROM m)
        |SELECT
        | floor((CAST(sy AS DOUBLE) * (CAST(sxx AS DOUBLE) * szz - CAST(sxz AS DOUBLE) * sxz)
        |   - CAST(sx AS DOUBLE) * (CAST(sxy AS DOUBLE) * szz - CAST(sxz AS DOUBLE) * szy)
        |   + CAST(sz AS DOUBLE) * (CAST(sxy AS DOUBLE) * sxz - CAST(sxx AS DOUBLE) * szy)) / dd * 10000 + 0.5) / 10000 AS b0_cents,
        | floor((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) * szz - CAST(sxz AS DOUBLE) * szy)
        |   - CAST(sy AS DOUBLE) * (CAST(sx AS DOUBLE) * szz - CAST(sxz AS DOUBLE) * sz)
        |   + CAST(sz AS DOUBLE) * (CAST(sx AS DOUBLE) * szy - CAST(sxy AS DOUBLE) * sz)) / dd * 10000 + 0.5) / 10000 AS b_qty_cents,
        | floor((CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) * szy - CAST(sxy AS DOUBLE) * sxz)
        |   - CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) * szy - CAST(sxy AS DOUBLE) * sz)
        |   + CAST(sy AS DOUBLE) * (CAST(sx AS DOUBLE) * sxz - CAST(sxx AS DOUBLE) * sz)) / dd * 10000 + 0.5) / 10000 AS b_disc_cents
        |FROM det""".stripMargin) { (s, d) =>
      // Nine exact power sums in ONE fact pass (map-side combinable);
      // the three Cramer determinants are fixed IEEE expressions over
      // those integers — no per-row float touches any accumulator.
      val x = col("l_quantity").cast("long")
      val z = floor(col("l_discount") * 100 + 0.5).cast("long")
      val y = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val m = Tables(s, d, "lineitem")
        .select(x.as("x"), z.as("z"), y.as("y"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("z").as("sz"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("z")).as("sxz"),
          sum(col("z") * col("z")).as("szz"), sum(col("x") * col("y")).as("sxy"),
          sum(col("z") * col("y")).as("szy"))
      def D(c0: String) = col(c0).cast("double")
      val dd = D("n") * (D("sxx") * col("szz") - D("sxz") * col("sxz")) -
        D("sx") * (D("sx") * col("szz") - D("sxz") * col("sz")) +
        D("sz") * (D("sx") * col("sxz") - D("sxx") * col("sz"))
      val det = m.withColumn("dd", dd)
      det.select(
        round((D("sy") * (D("sxx") * col("szz") - D("sxz") * col("sxz"))
          - D("sx") * (D("sxy") * col("szz") - D("sxz") * col("szy"))
          + D("sz") * (D("sxy") * col("sxz") - D("sxx") * col("szy"))) / col("dd"), 4)
          .as("b0_cents"),
        round((D("n") * (D("sxy") * col("szz") - D("sxz") * col("szy"))
          - D("sy") * (D("sx") * col("szz") - D("sxz") * col("sz"))
          + D("sz") * (D("sx") * col("szy") - D("sxy") * col("sz"))) / col("dd"), 4)
          .as("b_qty_cents"),
        round((D("n") * (D("sxx") * col("szy") - D("sxy") * col("sxz"))
          - D("sx") * (D("sx") * col("szy") - D("sxy") * col("sz"))
          + D("sy") * (D("sx") * col("sxz") - D("sxx") * col("sz"))) / col("dd"), 4)
          .as("b_disc_cents"))
    },

    // Decision stump: the best single threshold on event value for
    // predicting purchase-vs-view, over a fixed 19-point grid — the
    // one-split tree that baselines any fancier model.
    Q("q_ml_9_stump",
      """WITH e AS (SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        | FROM events WHERE event_type IN ('purchase', 'view')),
        |g AS (SELECT t.t,
        |  CAST(sum(CASE WHEN e.value <= t.t THEN 1 ELSE 0 END) AS BIGINT) AS nl,
        |  CAST(sum(CASE WHEN e.value <= t.t THEN e.pos ELSE 0 END) AS BIGINT) AS pl,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(e.pos) AS BIGINT) AS p
        | FROM e, (SELECT unnest(range(10, 200, 10)) AS t) t GROUP BY 1),
        |gini AS (SELECT t, nl, n - nl AS nr,
        |  CAST(floor((
        |   CASE WHEN nl = 0 THEN 0.0 ELSE CAST(nl AS DOUBLE) / n * (1 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl) - (1 - CAST(pl AS DOUBLE) / nl) * (1 - CAST(pl AS DOUBLE) / nl)) END
        |   + CASE WHEN n - nl = 0 THEN 0.0 ELSE CAST(n - nl AS DOUBLE) / n * (1 - (CAST(p - pl AS DOUBLE) / (n - nl)) * (CAST(p - pl AS DOUBLE) / (n - nl)) - (1 - CAST(p - pl AS DOUBLE) / (n - nl)) * (1 - CAST(p - pl AS DOUBLE) / (n - nl))) END
        |  ) * 1000000 + 0.5) AS BIGINT) AS gini6
        | FROM g)
        |SELECT CAST(t AS BIGINT) AS threshold, gini6 / 1000000.0 AS weighted_gini,
        | CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right
        |FROM gini ORDER BY gini6, t LIMIT 1""".stripMargin) { (s, d) =>
      // The 19-candidate grid cross-joins as a broadcast literal (the
      // fact is scanned ONCE; all 19 splits evaluate as conditional
      // sums in the same agg). The winner is chosen on the quantized
      // integer impurity with the threshold as tie-break.
      val e = Tables(s, d, "events")
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("value"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val grid = s.range(1, 20).select((col("id") * 10).as("t"))
      val g = e.crossJoin(broadcast(grid))
        .groupBy("t")
        .agg(sum(when(col("value") <= col("t"), 1L).otherwise(0L)).as("nl"),
          sum(when(col("value") <= col("t"), col("pos")).otherwise(0L)).as("pl"),
          count(lit(1)).as("n"), sum("pos").as("p"))
      def D(c0: org.apache.spark.sql.Column) = c0.cast("double")
      val pLeft = D(col("pl")) / col("nl")
      val pRight = D(col("p") - col("pl")) / (col("n") - col("nl"))
      val gini = g.select(col("t"), col("nl"), (col("n") - col("nl")).as("nr"),
        floor((
          when(col("nl") === 0, 0.0).otherwise(
            D(col("nl")) / col("n") * (lit(1) - pLeft * pLeft - (lit(1) - pLeft) * (lit(1) - pLeft)))
            + when(col("n") - col("nl") === 0, 0.0).otherwise(
              D(col("n") - col("nl")) / col("n")
                * (lit(1) - pRight * pRight - (lit(1) - pRight) * (lit(1) - pRight)))
          ) * 1000000 + 0.5).cast("long").as("gini6"))
      gini.select(col("t").cast("long").as("threshold"),
          (col("gini6") / 1000000.0).as("weighted_gini"),
          col("nl").as("n_left"), col("nr").as("n_right"), col("gini6"))
        .orderBy(col("gini6"), col("threshold")).limit(1).drop("gini6")
    },

    // Matryoshka audit: does retrieval with only the FIRST 16 of 64
    // dimensions find the same top-1 neighbor? (Prefix-truncatable
    // embeddings cut ANN memory 4× IF the prefix preserves neighbors —
    // this measures exactly that, instead of assuming it.)
    Q("q_sim_26_matryoshka",
      s"""WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id < 40),
         |pairs AS (SELECT p.pid, e.vec_id AS cid,
         |  CAST(floor((${Duck.cosine("p.pe", "e.embedding")}) * 1000000 + 0.5) AS BIGINT) AS full6,
         |  CAST(floor((${Duck.cosine("p.pe[1:16]", "e.embedding[1:16]")}) * 1000000 + 0.5) AS BIGINT) AS pre6
         | FROM probes p, embeddings e WHERE e.vec_id <> p.pid),
         |top AS (SELECT pid,
         |  (array_agg(cid ORDER BY full6 DESC, cid))[1] AS full_top,
         |  (array_agg(cid ORDER BY pre6 DESC, cid))[1] AS pre_top
         | FROM pairs GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_probes,
         | CAST(sum(CASE WHEN full_top = pre_top THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         | floor(CAST(sum(CASE WHEN full_top = pre_top THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS agree_rate
         |FROM top""".stripMargin) { (s, d) =>
      // Bounded brute-force demo (40 probes × corpus — the same scale
      // contract as q_sim_2; the IVF/LSH family is the declared scale
      // path). Both argmaxes order on the 1e-6-quantized cosine with
      // the candidate id as tie-break, so ties can't flip between
      // engines.
      graft.expressions.VectorExpressions.register(s)
      val e = Tables(s, d, "embeddings").localCheckpoint()
      val p = e.filter(col("vec_id") < 40)
        .select(col("vec_id").as("pid"), col("embedding").as("pe"))
      val pairs = p.crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("ce")))
        .filter(col("cid") =!= col("pid"))
        .select(col("pid"), col("cid"),
          floor(expr("cosine_similarity(pe, ce)") * 1000000 + 0.5).cast("long").as("full6"),
          floor(expr("cosine_similarity(slice(pe, 1, 16), slice(ce, 1, 16))") * 1000000 + 0.5)
            .cast("long").as("pre6"))
      val top = pairs.groupBy("pid")
        .agg(min_by(col("cid"), struct((-col("full6")).as("a"), col("cid").as("b"))).as("full_top"),
          min_by(col("cid"), struct((-col("pre6")).as("a"), col("cid").as("b"))).as("pre_top"))
      top.agg(count(lit(1)).as("n_probes"),
        sum(when(col("full_top") === col("pre_top"), 1L).otherwise(0L)).as("agree"),
        round(sum(when(col("full_top") === col("pre_top"), 1.0).otherwise(0.0))
          / count(lit(1)), 4).as("agree_rate"))
    },

    // Per-label diagonal Mahalanobis outliers: which vectors are far
    // from their OWN label's centroid in per-dimension-variance units
    // (euclidean treats a tight dim and a loose dim alike; this
    // normalizes each dim by its label's spread). Top 10.
    Q("q_sim_27_mahalanobis",
      """WITH comp AS (SELECT vec_id, label, i.dim,
        |  CAST(floor(CAST(embedding[i.dim] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS c6
        | FROM embeddings, (SELECT unnest(range(1, 65)) AS dim) i),
        |st AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(c6) AS BIGINT) AS s,
        |  CAST(sum(c6 * c6) AS BIGINT) AS ss FROM comp GROUP BY 1, 2),
        |term AS (SELECT comp.vec_id, comp.label,
        |  CAST(floor((CAST(st.n AS DOUBLE) * comp.c6 - st.s) * (CAST(st.n AS DOUBLE) * comp.c6 - st.s)
        |    / (CAST(st.n AS DOUBLE) * st.ss - CAST(st.s AS DOUBLE) * st.s) * 1000000 + 0.5) AS BIGINT) AS t6
        | FROM comp, st WHERE comp.label = st.label AND comp.dim = st.dim),
        |d2 AS (SELECT vec_id, label, CAST(sum(t6) AS BIGINT) AS d2_6 FROM term GROUP BY 1, 2)
        |SELECT vec_id, CAST(label AS BIGINT) AS label,
        | floor(sqrt(d2_6 / 1000000.0) * 10000 + 0.5) / 10000 AS mahalanobis
        |FROM d2 ORDER BY d2_6 DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      // ((n·x−s)²/(n·ss−s²) is dim-variance-normalized squared
      // deviation ×1/n... algebra: (x−μ)²/σ² with μ=s/n, σ²=(n·ss−s²)/n²
      // gives n²(x−μ)²/(n·ss−s²)·... — the form used is
      // (n·x−s)²/(n·(n·ss−s²)/n) — both engines compute the IDENTICAL
      // expression from exact integers, which is what the gate needs;
      // the ranking is on the exact integer term sum.
      val comp = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim0", "x")))
        .select(col("vec_id"), col("label"), (col("dim0") + 1).as("dim"),
          floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("c6"))
      val st = comp.groupBy(col("label").as("sl"), col("dim").as("sd"))
        .agg(count(lit(1)).as("n"), sum("c6").as("s"), sum(col("c6") * col("c6")).as("ss"))
      def D(c0: org.apache.spark.sql.Column) = c0.cast("double")
      val term = comp.join(broadcast(st), col("label") === col("sl") && col("dim") === col("sd"))
        .select(col("vec_id"), col("label"),
          floor((D(col("n")) * col("c6") - col("s")) * (D(col("n")) * col("c6") - col("s"))
            / (D(col("n")) * col("ss") - D(col("s")) * col("s")) * 1000000 + 0.5)
            .cast("long").as("t6"))
      val d2 = term.groupBy("vec_id", "label").agg(sum("t6").as("d2_6"))
      d2.select(col("vec_id"), col("label").cast("long").as("label"),
          round(sqrt(col("d2_6") / 1000000.0), 4).as("mahalanobis"), col("d2_6"))
        .orderBy(col("d2_6").desc, col("vec_id")).limit(10).drop("d2_6")
    },

    // Covariance top eigenvector by three unrolled power-iteration
    // steps from the all-ones start — which embedding direction carries
    // the most variance, and how much (the PCA-1 readout; the
    // full-spectrum q_sim_19/25 queries bound it from above).
    Q("q_sim_28_power_iter",
      """WITH comp AS (SELECT vec_id, i.dim,
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
        |ray AS (SELECT CAST(sum(v3.v * v2.v) AS BIGINT) AS num, CAST(sum(v2.v * v2.v) AS BIGINT) AS den
        | FROM v2, v3 WHERE v2.d1 = v3.d1)
        |SELECT (SELECT CAST(d1 AS BIGINT) FROM v3 ORDER BY abs(v) DESC, d1 LIMIT 1) AS top_dim,
        | floor(CAST(num AS DOUBLE) / den * 1000000.0 * 10000 + 0.5) / 10000 AS eigenvalue_est
        |FROM ray""".stripMargin) { (s, d) =>
      // The 64×64 covariance builds from ONE (vec, dim) self-join keyed
      // on vec_id (64²·n product rows, map-side combined to 4096 cov
      // cells — at scale this is the standard d²-bounded PCA moment
      // pass, never materializing n² anything). Each iterate quantizes
      // to integers before the next multiply, so all three steps are
      // exact on both engines; the Rayleigh quotient is one final IEEE
      // division of exact integer dot products.
      val comp = Tables(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim0", "x")))
        .select(col("vec_id"), (col("dim0") + 1).as("dim"),
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
      val v2 = cov.join(broadcast(v1.select(col("d1").as("vd"), col("v"))), col("d2") === col("vd"))
        .groupBy("d1").agg(floor(sum(col("cv6") * col("v")).cast("double") / 1000000.0 + 0.5)
          .cast("long").as("v"))
      val v3 = cov.join(broadcast(v2.select(col("d1").as("vd"), col("v"))), col("d2") === col("vd"))
        .groupBy("d1").agg(floor(sum(col("cv6") * col("v")).cast("double") / 1000000.0 + 0.5)
          .cast("long").as("v"))
      val ray = v2.select(col("d1").as("rd"), col("v").as("va"))
        .join(v3.select(col("d1").as("rd2"), col("v").as("vb")), col("rd") === col("rd2"))
        .agg(sum(col("vb") * col("va")).as("num"), sum(col("va") * col("va")).as("den"))
      val top = v3.orderBy(abs(col("v")).desc, col("d1")).limit(1)
        .select(col("d1").cast("long").as("top_dim"))
      top.crossJoin(broadcast(ray))
        .select(col("top_dim"),
          round(col("num").cast("double") / col("den") * 1000000.0, 4).as("eigenvalue_est"))
    }
  )
}
