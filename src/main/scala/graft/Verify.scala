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
    // --sql-only <outDir> [sfDir]: dump oracle_sql.json PLUS each
    // query's Spark result schema (spark_schema.json) so
    // tools/oracle_typecheck.py can lint DuckDB output types against
    // the actual Spark-side types (the int64-vs-DOUBLE drift that
    // produced every oracle failure in rounds 1–5 is invisible to a
    // DuckDB-only lint). Schemas come from plan ANALYSIS on the small
    // fixture dir — no result is written.
    if (sfDir == "--sql-only") {
      val fixtures = only.headOption.getOrElse("/root/testdata/sf0.001")
      new java.io.File(outDir).mkdirs()
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
        sqlJson(_ => true, fixtures))
      val spark = session()
      Files.writeString(Paths.get(s"$outDir/spark_schema.json"),
        schemaJson(spark, _ => true, fixtures))
      spark.stop()
      return
    }
    val spark = session()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        BlockCleanup(spark) // drop the query's localCheckpoint residue
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      sqlJson(selected, sfDir))
    Files.writeString(Paths.get(s"$outDir/spark_schema.json"),
      schemaJson(spark, selected, sfDir))
    graft.sources.SampledEdges.clear()
    spark.stop()
  }

  private def session(): SparkSession = {
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
    spark
  }

  /** name -> [[colName, catalystSimpleType], ...] for every selected
    * query, as JSON. Plan analysis only (.schema triggers no job for
    * declarative plans; builder-eager steps like localCheckpoint run on
    * the small fixture dir). Queries whose builder throws are recorded
    * as an empty list so the lint can report them as SKIP. */
  private def schemaJson(
      spark: SparkSession, selected: String => Boolean, sfDir: String): String = {
    def q(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    SparkEntry.queries.toSeq.filter { case (k, _) => selected(k) }
      .map { case (name, fn) =>
        val cols =
          try fn(spark, sfDir).schema.fields.toSeq
            .map(f => s"[${q(f.name)},${q(f.dataType.simpleString)}]")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name schema failed: ${e.getMessage}")
            Seq.empty
          }
        s"${q(name)}: ${cols.mkString("[", ",", "]")}"
      }
      .mkString("{", ",", "}")
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
