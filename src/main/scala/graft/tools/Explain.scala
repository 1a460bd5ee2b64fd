package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan + steady-state timing of
  * named declared queries at sf0.1 (or SPARK_GRAFT_SF_DIR). Usage:
  * `java -cp … graft.tools.Explain q_join_3_multiway …`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.explain("formatted")
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.count()
        println(s"run$i: ${(System.nanoTime() - t0) / 1e9}s")
      }
    }
    spark.stop()
  }
}
