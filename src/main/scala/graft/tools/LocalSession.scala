package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared local-mode session builder for the dev tools (Smoke, Explain,
  * Microbench, StreamDemo, GoldenGen). Verify/Bench keep their own
  * builders — they are driver-contract files and stay self-contained.
  */
object LocalSession {
  def apply(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
