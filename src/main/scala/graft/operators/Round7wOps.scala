package graft.operators

import graft.Q
import graft.functions.Num
import graft.functions.VectorFunctions.Duck
import graft.expressions.VectorExpressions
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 continuation (SURVEY §2.11bw): final pins — day-of-week
  * numbering conventions (a genuine cross-engine trap) and the
  * two-stage LSH→exact-rerank retrieval recall.
  */
object Round7wOps {

  private def D(c: Column) = c.cast("double")

  val all: Seq[Q] = Seq(

    // Day-of-week conventions: Spark's dayofweek() numbers Sunday=1
    // while DuckDB's dow() numbers Sunday=0 — the classic silent
    // off-by-one. BOTH sides are mapped explicitly to ISO (Mon=1..Sun=7)
    // and to the Monday week start (date_trunc week), then bucketed —
    // the pin that makes weekday features portable.
    Q("q_time_26_dow_conventions",
      """WITH t AS (SELECT
        |  CASE WHEN CAST(date_part('dow', o_orderdate) AS INTEGER) = 0 THEN 7
        |       ELSE CAST(date_part('dow', o_orderdate) AS INTEGER) END AS iso_dow,
        |  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
        | FROM orders)
        |SELECT CAST(iso_dow AS BIGINT) AS iso_dow,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(count(DISTINCT week_start) AS BIGINT) AS n_weeks,
        | CAST(sum(CASE WHEN iso_dow >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Spark: dayofweek is 1=Sunday..7=Saturday → ISO via (x+5)%7+1.
      // date_trunc('week') starts Monday on both engines (pinned here,
      // not assumed). n_weekend counts Sat+Sun rows per ISO bucket (so
      // only buckets 6 and 7 are nonzero — the column proves the
      // mapping, not just the distribution).
      val isoDow = (pmod(dayofweek(col("o_orderdate")) + 5, lit(7)) + 1)
      Tables(s, d, "orders")
        .select(isoDow.cast("long").as("iso_dow"),
          date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd")
            .as("week_start"))
        .groupBy("iso_dow")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("week_start")).as("n_weeks"),
          sum(when(col("iso_dow") >= 6, 1L).otherwise(0L)).as("n_weekend"))
        .orderBy("iso_dow")
    },

    // Two-stage retrieval: random-hyperplane LSH candidates (stage 1)
    // exactly reranked by cosine (stage 2), recall@5 against the
    // brute-force truth — the candidate-generation + rerank shape every
    // production vector search runs. Emits the stage-1 candidate count,
    // how many of the true top-5 survive stage 1 (recall ceiling), and
    // how many the reranked top-5 recovers (end-to-end recall).
    Q("q_sim_43_two_stage_recall",
      s"""WITH probe AS (SELECT embedding AS pvec FROM embeddings WHERE vec_id = 0),
         |sig AS (
         | SELECT vec_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 8)), (acc, j) -> acc +
         |   CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |     list_transform(list_zip(embedding, range(0, len(embedding))),
         |       p -> CAST(struct_extract(p, 1) AS DOUBLE) * (((struct_extract(p, 2) * 31 + j * 17) % 7) - 3))),
         |     (a, x) -> a + x) > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS sg
         | FROM embeddings),
         |psig AS (SELECT sg AS ps FROM sig WHERE vec_id = 0),
         |cand AS (SELECT s.vec_id FROM sig s, psig WHERE s.sg = psig.ps AND s.vec_id <> 0),
         |truth AS (SELECT vec_id FROM (
         |  SELECT e.vec_id, row_number() OVER (ORDER BY ${Duck.cosine("e.embedding", "p.pvec")} DESC, e.vec_id) AS rn
         |  FROM embeddings e, probe p WHERE e.vec_id <> 0) WHERE rn <= 5),
         |rerank AS (SELECT vec_id FROM (
         |  SELECT c.vec_id, row_number() OVER (ORDER BY ${Duck.cosine("e.embedding", "p.pvec")} DESC, c.vec_id) AS rn
         |  FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id, probe p) WHERE rn <= 5)
         |SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         | CAST((SELECT count(*) FROM cand JOIN truth ON cand.vec_id = truth.vec_id) AS BIGINT) AS n_truth_in_cand,
         | CAST((SELECT count(*) FROM rerank JOIN truth ON rerank.vec_id = truth.vec_id) AS BIGINT) AS n_truth_in_top5,
         | floor(CAST((SELECT count(*) FROM rerank JOIN truth ON rerank.vec_id = truth.vec_id) AS DOUBLE)
         |   / 5 * 1000000 + 0.5) / 1000000 AS recall_at_5""".stripMargin) { (s, d) =>
      // Stage 1 shuffles only 8-bit signatures (lsh_bucket over the
      // packed planes); stage 2's exact cosine runs on the CANDIDATE
      // set only — the corpus is never self-joined. The truth pass is
      // the eval's own cost, not the serving path's.
      VectorExpressions.register(s)
      val e = Tables(s, d, "embeddings")
      val sig = e.select(col("vec_id"), col("embedding"),
        expr("lsh_bucket(embedding, 8)").as("sg"))
      val psig = sig.filter(col("vec_id") === 0).select(col("sg").as("ps"))
      val cand = sig.join(broadcast(psig), col("sg") === col("ps"))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pvec"))
      val truth = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), expr("cosine_similarity(embedding, pvec)").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(5)
        .select(col("vec_id").as("tid"))
      val rerank = cand.crossJoin(broadcast(probe))
        .select(col("vec_id"), expr("cosine_similarity(embedding, pvec)").as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(5)
        .select(col("vec_id").as("rid"))
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val nCeil = cand.join(broadcast(truth), col("vec_id") === col("tid"))
        .agg(count(lit(1)).as("n_truth_in_cand"))
      val nTop = rerank.join(broadcast(truth), col("rid") === col("tid"))
        .agg(count(lit(1)).as("n_truth_in_top5"))
      nCand.crossJoin(nCeil).crossJoin(nTop)
        .select(col("n_candidates"), col("n_truth_in_cand"), col("n_truth_in_top5"),
          Num.round(D(col("n_truth_in_top5")) / 5, 6).as("recall_at_5"))
    }
  )
}
