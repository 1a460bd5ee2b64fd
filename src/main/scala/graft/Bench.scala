package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Protocol (same as BASELINE.md's binding numbers):
  * one full untimed warm pass (absorbs codegen + JIT churn — with ~130
  * distinct queries the generated whole-stage-codegen classes swamp the
  * JIT compile queue and random mid-suite queries would run interpreted,
  * observed 10-40x outliers), then one timed steady-state pass.
  *
  * Output durability (round-1 lesson: a single >16 KB stdout line got
  * truncated by the log capture and 77/136 timings were lost):
  *  - the FULL per-query JSON is written to bench_out.json (override
  *    with SPARK_GRAFT_BENCH_OUT);
  *  - stdout gets per-family subtotal lines plus ONE compact JSON line
  *    (per-query seconds rounded to 3 decimals) that stays well under
  *    any capture limit.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional name-substring args restrict the run (local spot-timing
    // only; the driver always runs the full set)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0

    def json(qs: Iterable[(String, Double)], fmt: Double => String): String =
      qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${json(results, _.toString)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Per-family subtotals (family = the token after "q_"), for humans
    // and for cross-checking a truncated capture.
    val fam = results.toSeq
      .groupBy { case (n, _) => n.split("_").lift(1).getOrElse("other") }
      .map { case (f, qs) => f -> qs.map(_._2).sum }
      .toSeq.sortBy(-_._2)
    fam.foreach { case (f, s) => println(f"BENCH_FAMILY $f%-8s ${s}%8.2f sec") }
    // loud per-query budget flags: >5s = over the per-query budget,
    // >10s = over the acceptance bound (the round-4 ⚠ class)
    results.filter(_._2 > 5.0).toSeq.sortBy(-_._2).foreach { case (n, s) =>
      println(f"BENCH_WARN  $n%-34s ${s}%6.2f sec ${if (s > 10) "OVER ACCEPTANCE BOUND" else "over 5s budget"}")
    }
    println(s"BENCH_FULL_JSON written to $outPath (${results.size} queries)")

    val compact = json(results, v => f"$v%.3f")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$compact,"sf":"$sfDir","queries_file":"$outPath"}""")
    spark.stop()
  }
}
