package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_join_3_multiway exercises scan → broadcast joins → hash agg → sort
    * end-to-end (SURVEY §7.2 minimum slice).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q_join_3_multiway").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * ListMap: iteration order == declaration order (bench determinism).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(Registry.all.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(Registry.all.flatMap(q => q.oracle.map(o => q.name -> o)): _*)
}
