package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [name-substring ...] — optional substrings
    // restrict the dump to matching queries (local spot-checks only;
    // the driver always runs the full set).
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2)
    def selected(name: String): Boolean =
      only.isEmpty || only.exists(name.contains)
    // --sql-only <outDir> [sfDir]: dump oracle_sql.json without a Spark
    // session (feeds tools/oracle_typecheck.py's DuckDB output-type lint).
    if (sfDir == "--sql-only") {
      new java.io.File(outDir).mkdirs()
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
        sqlJson(_ => true, only.headOption.getOrElse("/root/testdata/sf0.001")))
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet stores TIMESTAMP(NANOS) which Spark 4 cannot read
      // natively; graft.sources.Tables relies on this legacy conf.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      sqlJson(selected, sfDir))
    spark.stop()
  }

  /** oracleSql as a JSON object, with the {SF_DIR} placeholder (used by
    * path-addressed oracles like q_scan_11_binaryfile) substituted with
    * this run's fixture dir so both engines address the same files.
    * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or
    * CR in builder-authored SQL would otherwise make the driver's
    * json.load fail and silently zero the round's correctness. */
  private def sqlJson(selected: String => Boolean, sfDir: String): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{SF_DIR}", sfDir))}" }
      .mkString("{", ",", "}")
  }
}
