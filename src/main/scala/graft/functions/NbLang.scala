package graft.functions

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes language classifier, trained and scored on
  * the corpus itself (shared by q_ml_2_nbayes / q_ml_3_nb_confusion).
  *
  * Laplace-1 smoothing gives every score a CLOSED FORM over present
  * tokens only:
  *   score(d,L) = ln P(L) + Σ_t tf·ln(c_Lt+1) − |d|·ln(n_L + V)
  * (absent tokens contribute ln 1 = 0 to the numerator), so the
  * doc×lang score table needs only the tf⋈counts join on token — never
  * a doc×vocab densification. Every ln is quantized to a 1e-9 integer
  * FIRST, so scores are exact BIGINTs and the argmax (score desc, lang
  * asc) is engine-deterministic.
  *
  * Scale: ONE corpus explode feeds the checkpointed (doc, lang, token,
  * tf) profile; every other statistic is a rollup of it. The score join
  * is token-keyed (vocab-bounded build side); the |langs|-row parameter
  * table broadcasts.
  */
object NbLang {

  private def q9(x: Column): Column = floor(log(x) * 1000000000L + 0.5).cast("long")

  /** One row per document: (doc_id, lang = actual, pred = NB argmax). */
  def predictions(s: SparkSession, d: String): DataFrame = {
    val p = scores(s, d).withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy(col("score9").desc, col("lang"))))
      .filter(col("rn") === 1).select(col("doc_id"), col("lang").as("pred"))
    Tables(s, d, "documents").select(col("doc_id"), col("lang")).join(p, "doc_id")
  }

  /** The full NB score table: one row per (doc_id, candidate lang) with
    * the exact-BIGINT 1e-9-nat score — the argmax input `predictions`
    * consumes and the margin input q_text_43_lang_margin ranks. */
  def scores(s: SparkSession, d: String): DataFrame = {
    val tf0 = Tables(s, d, "documents")
      .select(col("doc_id"), col("lang"), explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val tf = tf0.select("doc_id", "token", "tf")
    val dw = tf0.groupBy("doc_id").agg(sum("tf").as("words"))
    val c = tf0.groupBy("lang", "token").agg(sum("tf").as("c")).localCheckpoint()
    val v = c.agg(countDistinct("token").as("v"))
    val nl = c.groupBy("lang").agg(sum("c").as("nl"))
    val pr = Tables(s, d, "documents").groupBy("lang").agg(count(lit(1)).as("dl"))
      .withColumn("dd", sum("dl").over(Window.partitionBy()))
    val lp = pr.join(nl, "lang").crossJoin(broadcast(v))
      .select(col("lang"),
        q9(col("dl").cast("double") / col("dd")).as("prior9"),
        q9((col("nl") + col("v")).cast("double")).as("lnl9"))
    val s1 = tf.join(c.withColumnRenamed("lang", "clang"), "token")
      .groupBy(col("doc_id"), col("clang").as("lang"))
      .agg(sum(col("tf") * q9((col("c") + 1).cast("double"))).cast("long").as("s"))
    dw.crossJoin(broadcast(lp))
      .join(s1, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("lang"),
        (col("prior9") + coalesce(col("s"), lit(0L)) - col("words") * col("lnl9")).as("score9"))
  }

  /** The oracle-SQL CTE chain ending in `p(doc_id, pred)` + the raw
    * documents join — shared verbatim by both declared queries so the
    * two oracles cannot drift apart. */
  val oracleCtes: String =
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      |dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS words FROM tok GROUP BY 1),
      |c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
      |v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM c),
      |nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM c GROUP BY 1),
      |pr AS (SELECT lang, CAST(count(*) AS BIGINT) AS dl, CAST(sum(count(*)) OVER () AS BIGINT) AS dd FROM documents GROUP BY 1),
      |lp AS (SELECT pr.lang,
      |  CAST(floor(ln(CAST(dl AS DOUBLE) / dd) * 1000000000 + 0.5) AS BIGINT) AS prior9,
      |  CAST(floor(ln(CAST(nl.nl + v.v AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS lnl9
      | FROM pr JOIN nl ON pr.lang = nl.lang CROSS JOIN v),
      |s1 AS (SELECT tf.doc_id, c.lang,
      |  CAST(sum(tf.tf * CAST(floor(ln(CAST(c.c + 1 AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS s
      | FROM tf JOIN c ON tf.token = c.token GROUP BY 1, 2),
      |sc AS (SELECT dw.doc_id, lp.lang, lp.prior9 + COALESCE(s1.s, 0) - dw.words * lp.lnl9 AS score9
      | FROM dw CROSS JOIN lp LEFT JOIN s1 ON s1.doc_id = dw.doc_id AND s1.lang = lp.lang),
      |p AS (SELECT doc_id, lang AS pred FROM (
      |  SELECT doc_id, lang, row_number() OVER (PARTITION BY doc_id ORDER BY score9 DESC, lang) AS rn FROM sc)
      | WHERE rn = 1)""".stripMargin
}
