package graft

import org.apache.spark.sql.SparkSession

/** t1 smoke entry point: runs SparkEntry.entry on sf0.001 exactly as the
  * driver does and prints the row count (must be > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.tools.LocalSession("4")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"entry rows = $n")
    spark.stop()
  }
}
