package graft

import org.apache.spark.sql.functions._

/** DDSketch invariants: the α relative-error guarantee across the
  * quantile range, merge determinism under repartitioning, and the
  * loud-failure domain contract.
  */
class DDSketchSpec extends SparkSpec {

  import spark.implicits._

  private def registered() = { graft.expressions.DDSketchAgg.register(spark); spark }

  test("relative error stays inside alpha across p10/p50/p90/p99 on a log-uniform range") {
    registered()
    // values 1..50000: exact q-quantile of 1..n is known in closed form
    val n = 50000
    val df = spark.range(1, n + 1).select((col("id")).cast("double").as("v")).repartition(8)
    for (q <- Seq(0.10, 0.50, 0.90, 0.99)) {
      val est = df.selectExpr(s"ddsketch_quantile(v, ${q}D) AS e").as[Double].head()
      val exact = df.selectExpr(s"percentile(v, ${q}D) AS p").as[Double].head()
      val rel = math.abs(est - exact) / exact
      assert(rel <= 0.021, f"q=$q est=$est exact=$exact rel=$rel%.4f exceeds alpha")
    }
  }

  test("merge is deterministic: same estimate at 1, 8, and 32 partitions") {
    registered()
    val base = spark.range(1, 20001).select(col("id").cast("double").as("v"))
    val ests = Seq(1, 8, 32).map { p =>
      base.repartition(p).selectExpr("ddsketch_quantile(v, 0.5D) AS e").as[Double].head()
    }
    assert(ests.distinct.size == 1, s"partitioning leaked into the sketch: $ests")
  }

  test("group-by sketches agree with per-group exact percentiles within band") {
    registered()
    val rows = Registry.byName("q_agg_22_ddsketch").fn(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) == 1L, s"${r.getString(0)}: sketch outside the 3% band")
    }
  }

  test("non-positive values are rejected loudly") {
    registered()
    val e = intercept[Exception] {
      Seq(1.0, -2.0).toDF("v").selectExpr("ddsketch_quantile(v, 0.5D)").collect()
    }
    def hasMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("strictly positive"))
        || hasMsg(t.getCause))
    assert(hasMsg(e), s"expected the domain error, got: $e")
  }

  test("empty input yields NULL, not a crash") {
    registered()
    val r = Seq.empty[Double].toDF("v").selectExpr("ddsketch_quantile(v, 0.5D) AS e").collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }
}
