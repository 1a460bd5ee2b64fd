package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-scale joins.
  *
  * `saltedJoin` implements the classic salt/replicate pattern for a
  * skewed equi-join: the skewed (large) side gets a deterministic salt
  * in [0, n), the small side is replicated n×, and the join key becomes
  * (key, salt) — splitting each hot key's rows across n reducers.
  *
  * Salt derivation is `pmod(hash(row-unique cols), n)` — deterministic,
  * so results are reproducible run-to-run. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin`) handles moderate skew automatically;
  * explicit salting is for the pathological hot-key case (one key ≫
  * a single executor's memory) where AQE's partition-splitting cannot
  * help a shuffled hash join build side.
  */
object Skew {

  /** Join `large` (skewed on `key`) with `small` on `key`, salted `n` ways.
    *
    * @param saltSource columns of `large` that vary within a key (used to
    *                   spread rows deterministically across salts)
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      n: Int,
      saltSource: Seq[String]): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(saltSource.map(col): _*), lit(n)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Per-key frequency table — the diagnostic used to decide whether a
    * key needs salting (top-k heavy hitters and their share).
    */
  def keyHistogram(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topK)
}
