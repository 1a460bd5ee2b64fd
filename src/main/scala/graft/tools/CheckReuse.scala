package graft.tools

/** Dev utility (round 9): run named declared queries and report whether
  * AQE stage reuse deduplicated their shared subplans at runtime — the
  * check behind the r9 diamond rule (a plan used TWICE dedups via the
  * stage cache; 3+-way mixed-join-key diamonds, or branches whose
  * canonical forms differ by an inferred isnotnull join filter, rescan).
  * Usage: `java -cp … graft.tools.CheckReuse q_text_24_pmi …`
  */
object CheckReuse {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (n <- args) {
      val df = graft.Registry.byName(n).fn(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(n + ": finalPlanScanNodes=" + "Scan parquet".r.findAllIn(p).length +
        " reusedMarkers=" + "ReusedExchange|ReusedQueryStage".r.findAllIn(p).length)
    }
    spark.stop()
  }
}
