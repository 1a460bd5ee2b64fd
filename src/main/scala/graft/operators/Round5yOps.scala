package graft.operators

import graft.Q
import graft.functions.VectorFunctions.Duck
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11ah): embedding and corpus audits —
  * instance-level triplet margins, norm anisotropy, duplicate-cluster
  * size law, and the cross-language vocabulary overlap matrix.
  *
  * Determinism discipline (§2.12): cosines quantize to 1e-6 integers at
  * comparison time; norms quantize before group statistics; all set
  * sizes are exact integer counts.
  */
object Round5yOps {

  val all: Seq[Q] = Seq(

    // Instance-level triplet audit: for each probe, does its nearest
    // SAME-label vector beat its nearest OTHER-label vector, and by
    // what cosine margin — the per-anchor R@1 readout (q_sim_23's
    // intra/inter distributions are aggregate; a fine mean can hide
    // many violated anchors).
    Q("q_sim_29_triplet",
      s"""WITH s AS (SELECT vec_id, label, embedding FROM embeddings),
         |pr AS (SELECT a.vec_id AS pid, a.label = b.label AS same,
         |  CAST(floor((${Duck.cosine("a.embedding", "b.embedding")}) * 1000000 + 0.5) AS BIGINT) AS c6
         | FROM s a JOIN s b ON a.vec_id <> b.vec_id WHERE a.vec_id < 60),
         |best AS (SELECT pid,
         |  max(CASE WHEN same THEN c6 END) AS pos6,
         |  max(CASE WHEN NOT same THEN c6 END) AS neg6
         | FROM pr GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_probes,
         | CAST(sum(CASE WHEN pos6 > neg6 THEN 1 ELSE 0 END) AS BIGINT) AS n_satisfied,
         | floor(CAST(sum(CASE WHEN pos6 > neg6 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS satisfied_rate,
         | floor(CAST(sum(pos6 - neg6) AS DOUBLE) / count(*) / 1000000 * 1000000 + 0.5) / 1000000 AS mean_margin
         |FROM best""".stripMargin) { (s, d) =>
      // Bounded probe set (60 anchors × corpus — the q_sim_2 scale
      // contract; ANN candidates replace the scan at scale). Margins
      // compare and sum as exact quantized integers.
      graft.expressions.VectorExpressions.register(s)
      val e = Tables(s, d, "embeddings").localCheckpoint()
      val a = e.filter(col("vec_id") < 60)
        .select(col("vec_id").as("pid"), col("label").as("la"), col("embedding").as("ea"))
      val pr = a.crossJoin(e.select(col("vec_id").as("cid"), col("label").as("lb"),
          col("embedding").as("eb")))
        .filter(col("pid") =!= col("cid"))
        .select(col("pid"), (col("la") === col("lb")).as("same"),
          floor(expr("cosine_similarity(ea, eb)") * 1000000 + 0.5).cast("long").as("c6"))
      val best = pr.groupBy("pid")
        .agg(max(when(col("same"), col("c6"))).as("pos6"),
          max(when(!col("same"), col("c6"))).as("neg6"))
      best.agg(count(lit(1)).as("n_probes"),
        sum(when(col("pos6") > col("neg6"), 1L).otherwise(0L)).as("n_satisfied"),
        (floor(sum(when(col("pos6") > col("neg6"), 1L).otherwise(0L)).cast("double")
          / count(lit(1)) * 10000 + 0.5) / 10000).as("satisfied_rate"),
        (floor(sum(col("pos6") - col("neg6")).cast("double") / count(lit(1)) / 1000000
          * 1000000 + 0.5) / 1000000).as("mean_margin"))
    },

    // Norm anisotropy per label: mean/min/max of the embedding L2 norms
    // — unnormalized embeddings make cosine and dot-product retrieval
    // disagree; this is the one-pass audit that says whether the corpus
    // needs normalization before indexing.
    Q("q_sim_30_norms",
      """WITH comp AS (SELECT vec_id, label, i.dim,
        |  CAST(floor(CAST(embedding[i.dim] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS c6
        | FROM embeddings, (SELECT unnest(range(1, 65)) AS dim) i),
        |n AS (SELECT vec_id, label,
        |  CAST(floor(sqrt(CAST(sum(c6 * c6) AS DOUBLE)) / 1000000.0 * 1000000 + 0.5) AS BIGINT) AS norm6
        | FROM comp GROUP BY 1, 2)
        |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        | floor(CAST(sum(norm6) AS DOUBLE) / count(*) / 1000000 * 10000 + 0.5) / 10000 AS mean_norm,
        | floor(CAST(min(norm6) AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000 AS min_norm,
        | floor(CAST(max(norm6) AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000 AS max_norm
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Per-vector norm = one sqrt over an exact integer sum of
      // squares, quantized to 1e-6 BEFORE the label statistics — so
      // mean/min/max are integer arithmetic. One explode pass,
      // map-side combinable.
      val comp = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim0", "x")))
        .select(col("vec_id"), col("label"),
          floor(col("x").cast("double") * 1000000 + 0.5).cast("long").as("c6"))
      val n = comp.groupBy("vec_id", "label")
        .agg(floor(sqrt(sum(col("c6") * col("c6")).cast("double")) / 1000000.0 * 1000000 + 0.5)
          .cast("long").as("norm6"))
      n.groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
          (floor(sum("norm6").cast("double") / count(lit(1)) / 1000000 * 10000 + 0.5) / 10000)
            .as("mean_norm"),
          (floor(min("norm6").cast("double") / 1000000 * 10000 + 0.5) / 10000).as("min_norm"),
          (floor(max("norm6").cast("double") / 1000000 * 10000 + 0.5) / 10000).as("max_norm"))
        .orderBy("label")
    },

    // Duplicate-cluster size law: how many exact-dup clusters exist at
    // each size, plus the share of the corpus held in clusters of that
    // size — the power-law readout that decides whether dedup is worth
    // a full pass (a fat tail of big clusters = big wins).
    Q("q_dedup_22_cluster_sizes",
      """WITH k AS (SELECT md5(text) AS dg, CAST(count(*) AS BIGINT) AS k FROM documents GROUP BY 1),
        |h AS (SELECT k, CAST(count(*) AS BIGINT) AS n_clusters, CAST(k * count(*) AS BIGINT) AS n_docs
        | FROM k GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM h)
        |SELECT h.k AS cluster_size, h.n_clusters, h.n_docs,
        | floor(CAST(h.n_docs AS DOUBLE) / t.total * 1000000 + 0.5) / 1000000 AS doc_share
        |FROM h, t ORDER BY h.k""".stripMargin) { (s, d) =>
      // Histogram-of-the-histogram: digest groupBy (16-byte shuffle),
      // then a size groupBy over the cluster table — both map-side
      // combinable; total via one-row broadcast.
      val k = Tables(s, d, "documents")
        .groupBy(md5(col("text")).as("dg")).agg(count(lit(1)).as("k"))
      val h = k.groupBy("k")
        .agg(count(lit(1)).as("n_clusters"), (col("k") * count(lit(1))).as("n_docs"))
        .select(col("k"), col("n_clusters"), col("n_docs"))
      val t = h.agg(sum("n_docs").as("total"))
      h.crossJoin(broadcast(t))
        .select(col("k").as("cluster_size"), col("n_clusters"), col("n_docs"),
          (floor(col("n_docs").cast("double") / col("total") * 1000000 + 0.5) / 1000000)
            .as("doc_share"))
        .orderBy("cluster_size")
    },

    // Cross-language vocabulary overlap: Jaccard of the distinct-token
    // vocabularies for every language pair — quantifies shared
    // vocabulary (loanwords/templates) that makes the q_text_4 n-gram
    // language-ID boundary soft.
    Q("q_text_48_vocab_overlap",
      """WITH v AS (SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |inter AS (SELECT a.lang AS la, b.lang AS lb, CAST(count(*) AS BIGINT) AS c
        | FROM v a JOIN v b ON a.tok = b.tok AND a.lang < b.lang GROUP BY 1, 2)
        |SELECT la, lb, sa.n AS n_a, sb.n AS n_b, inter.c AS n_common,
        | floor(CAST(inter.c AS DOUBLE) / (sa.n + sb.n - inter.c) * 1000000 + 0.5) / 1000000 AS jaccard
        |FROM inter JOIN sz sa ON la = sa.lang JOIN sz sb ON lb = sb.lang
        |ORDER BY la, lb""".stripMargin) { (s, d) =>
      // The (lang, token) vocabulary relation dedups once; the pair
      // intersection joins per token (wedge shape over ≤5 langs per
      // token — never a cross join of vocabularies).
      val v = Tables(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .distinct().localCheckpoint()
      val sz = v.groupBy("lang").agg(count(lit(1)).as("n"))
      val inter = v.as("a").join(v.as("b"),
          col("a.tok") === col("b.tok") && col("a.lang") < col("b.lang"))
        .groupBy(col("a.lang").as("la"), col("b.lang").as("lb"))
        .agg(count(lit(1)).as("c"))
      inter
        .join(broadcast(sz.select(col("lang").as("la"), col("n").as("n_a"))), Seq("la"))
        .join(broadcast(sz.select(col("lang").as("lb"), col("n").as("n_b"))), Seq("lb"))
        .select(col("la"), col("lb"), col("n_a"), col("n_b"), col("c").as("n_common"),
          (floor(col("c").cast("double") / (col("n_a") + col("n_b") - col("c")) * 1000000 + 0.5)
            / 1000000).as("jaccard"))
        .orderBy("la", "lb")
    }
  )
}
