package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator-query of the engine (SURVEY.md §2 inventory).
  *
  * @param name   stable key, the driver's correctness identifier
  * @param oracle equivalent DuckDB SQL over the same parquet tables
  *               (None = not SQL-expressible; driver does rows-only check)
  * @param fn     the DataFrame program: (session, sfDir) => result.
  *               Every oracle-checked query ends in a total ORDER BY and
  *               rounds float aggregates (SURVEY §2.12 determinism rules).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), fn)
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, None, fn)
}
