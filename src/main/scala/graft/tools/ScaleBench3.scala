package graft.tools

import org.apache.spark.sql.SparkSession

/** Three-point scale rehearsal (round 10, VERDICT r9 item 2): two scale
  * points cannot separate "linear" from "quadratic with a small
  * constant" — an n²/1000 plan reads as exponent 0.93 at 10× (exactly
  * how q_dedup_9_entity's fixed-cardinality blocking hid through round
  * 8). With sf0.1 / sf1′ (10×) / sf3′ (30×) the least-squares slope of
  * log t over log factor separates them: linear ⇒ slope ≤ ~1 at every
  * pairwise step; n² ⇒ the 10×→30× step alone shows slope → 2.
  *
  * Prints per-query wall times at each point, the pairwise exponents
  * e(1→10) and e(10→30), and the 3-point LSQ slope. Timings are
  * min-of-two after one untimed warm pass per dataset (the ScaleBench
  * protocol); BlockCleanup runs between queries so checkpoint residue
  * from one point can't squeeze the next (the r9 drift lesson).
  *
  * Usage:
  *   graft.tools.ScaleBench3 <q1,q2,...> <dir0:f0> <dir1:f1> [dir2:f2 ...]
  * e.g.
  *   graft.tools.ScaleBench3 q_dedup_9_entity,q_graph_14_bipartite \
  *     /root/testdata/sf0.1:1 /tmp/graft_sf1:10 /tmp/graft_sf3:30
  */
object ScaleBench3 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleBench3 <q1,q2,...> <dir:factor> <dir:factor> [...]")
    val names = args(0).split(",").toSeq
    val points = args.drop(1).toSeq.map { a =>
      val Array(dir, f) = a.split(":"); (dir, f.toDouble)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // see LocalSession: partitions scale with the fixture, threads don't
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Queries whose OUTPUT is quadratic in ScaleGen's density scaling
    // (10x denser data over the SAME calendar window — a time-band
    // join's true pair count grows f² BY DEFINITION; the ScaleBench
    // r9 adjudication): exponents for these fit log t against log
    // WORK (the named column's sum), not log input factor.
    val outputBound = Map(
      "q_join_8_theta_range" -> "n_pairs",
      "q_join_12_range_auto" -> "n_pairs",
      "q_join_26_band_tuning" -> "n_candidates")
    def workUnits(n: String, dir: String): Double =
      graft.SparkEntry.queries(n)(spark, dir)
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col(outputBound(n))))
        .head().getLong(0).toDouble

    def time(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.BlockCleanup(spark)
        dt
      }
      math.min(once(), once())
    }
    // one untimed warm pass per (query, dataset) absorbs codegen/JIT
    for (n <- names; (dir, _) <- points) {
      try { graft.SparkEntry.queries(n)(spark, dir).count() }
      catch { case _: Throwable => () }
      graft.BlockCleanup(spark)
    }
    val hdr = points.map { case (_, f) => f"t(${f}%.0fx) s" }.mkString(" | ")
    println(s"| query | $hdr | pairwise e | lsq slope |")
    println("|---|" + points.map(_ => "---|").mkString + "---|---|")
    var bad = List.empty[String]
    for (n <- names) {
      val ts = points.map { case (dir, f) =>
        val work =
          if (outputBound.contains(n))
            try workUnits(n, dir) catch { case _: Throwable => f }
          else f
        (work, try time(n, dir) catch { case _: Throwable => -1.0 })
      }
      val ok = ts.filter(_._2 > 0)
      val pairwise = ok.sliding(2).collect { case Seq((f0, t0), (f1, t1)) =>
        math.log(t1 / t0) / math.log(f1 / f0)
      }.toSeq
      // least-squares slope of log t over log f across all points
      val xs = ok.map { case (f, _) => math.log(f) }
      val ys = ok.map { case (_, t) => math.log(t) }
      val nP = xs.length
      val slope =
        if (nP >= 2) {
          val mx = xs.sum / nP; val my = ys.sum / nP
          val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
          val den = xs.map(x => (x - mx) * (x - mx)).sum
          num / den
        } else Double.NaN
      val tCols = ts.map { case (_, t) => f"$t%.2f" }.mkString(" | ")
      val pw = pairwise.map(e => f"$e%.2f").mkString(" / ")
      val tag = if (outputBound.contains(n))
        f" (per-output, work ×${ts.last._1 / ts.head._1}%.0f)" else ""
      println(f"| $n$tag | $tCols | $pw | $slope%.2f |")
      // the last pairwise step is the discriminator: a small-constant
      // quadratic shows its true slope only once n² dominates
      if (pairwise.nonEmpty && pairwise.last > 1.15) bad ::= n
      if (!slope.isNaN && slope > 1.15) bad ::= n
    }
    println(s"SCALE_SUPERLINEAR ${bad.distinct.sorted.mkString(",")}")
    graft.sources.SampledEdges.clear()
    spark.stop()
  }
}
