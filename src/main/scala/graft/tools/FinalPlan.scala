package graft.tools

/** Print the POST-AQE executed plan of declared queries (r12). Explain
  * shows the static plan — join strategies there are pre-adaptive; this
  * runs the query and prints the final adaptive plan, the artifact that
  * proves claims like "the un-hinted node-table join broadcasts at test
  * scale via AQE and can fall back to shuffle at 100x".
  *
  * Usage: graft.tools.FinalPlan <query> [query ...]
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (n <- args) {
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, d)
      // collect() executes THIS dataset's QueryExecution (count() would
      // plan a separate one), so executedPlan below is the finalized
      // AdaptiveSparkPlan (isFinalPlan=true)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
