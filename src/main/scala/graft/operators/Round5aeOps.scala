package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-5 continuation (SURVEY §2.11an): native Jaro–Winkler fuzzy
  * matching — the entity-resolution scorer where edit distance
  * over-penalizes transpositions — implemented as a codegen Catalyst
  * Expression (`expressions/StringSimilarity.scala`) and hash-matched
  * against DuckDB's builtin `jaro_winkler_similarity`.
  */
object Round5aeOps {

  val all: Seq[Q] = Seq(

    // Fuzzy-name candidate pairs: distinct part names scored pairwise
    // by Jaro–Winkler, pairs >= 0.8 — the q_dedup_9 blocked-resolution
    // scorer upgraded from edit distance (which rates 'red plate' vs
    // 'red plates' the same as two substitutions elsewhere; JW rewards
    // the shared prefix).
    Q("q_dedup_24_jaro",
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |pairs AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000 + 0.5) AS BIGINT) AS jw6
        | FROM names a JOIN names b ON a.p_name < b.p_name)
        |SELECT name_a, name_b, jw6 / 1000000.0 AS jaro_winkler
        |FROM pairs WHERE jw6 >= 800000
        |ORDER BY jw6 DESC, name_a, name_b""".stripMargin) { (s, d) =>
      // The pair join runs over the DISTINCT name vocabulary (catalog-
      // bounded — the 2000-part table holds ~50 distinct names; at
      // 100 TB the vocabulary is still dictionary-sized while the fact
      // is not, so names-first is the scale plan). The native
      // expression stays inside whole-stage codegen (one static call,
      // the Spark Levenshtein pattern). Both engines' JW agrees
      // bit-for-bit on the standard semantics incl. the 0.7 boost
      // threshold (probed; see StringSimilarity.scala).
      graft.expressions.StringExpressions.register(s)
      val names = Tables(s, d, "part").select("p_name").distinct().localCheckpoint()
      val pairs = names.as("a")
        .join(names.as("b"), col("a.p_name") < col("b.p_name"))
        .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          floor(expr("jaro_winkler(name_a, name_b)") * 1000000 + 0.5).cast("long").as("jw6"))
      pairs.filter(col("jw6") >= 800000)
        .select(col("name_a"), col("name_b"), (col("jw6") / 1000000.0).as("jaro_winkler"))
        .orderBy(col("jaro_winkler").desc, col("name_a"), col("name_b"))
    }
  )
}
