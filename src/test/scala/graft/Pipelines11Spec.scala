package graft

import graft.api.Pipelines
import org.apache.spark.sql.functions._

/** Round-7o/7r/7s/7u Pipelines wrappers pinned EXACTLY against their
  * declared oracle-checked queries on sf0.001.
  */
class Pipelines11Spec extends SparkSpec {

  private def orders = graft.sources.Tables(spark, sf, "orders")
  private def documents = graft.sources.Tables(spark, sf, "documents")

  private def monthly =
    orders.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).cast("long").as("x"))

  test("pinballEval == q_ml_13_pinball") {
    val withSeg = orders
      .join(graft.sources.Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("t2"),
        col("o_orderkey"))
    val api = Pipelines.pinballEval(withSeg, "seg", "t2", "o_orderkey")
      .orderBy("seg").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_ml_13_pinball").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("mase == q_ml_14_mase") {
    val api = Pipelines.mase(monthly, "ym", "x").collect().head
    val pinned = Registry.byName("q_ml_14_mase").fn(spark, sf).collect().head
    assert(api.toSeq == pinned.toSeq)
  }

  test("hodgesLehmann == q_stat_44_hodges_lehmann") {
    val series = orders.groupBy(col("o_orderpriority").as("pr"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("x"))
    val api = Pipelines.hodgesLehmann(series, "pr", "ym", "x")
      .orderBy("pr").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_stat_44_hodges_lehmann").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("kendallTauB == q_stat_46_kendall_tau_b") {
    val series = orders.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .agg(count(lit(1)).as("x"),
        (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          / count(lit(1))).cast("long").as("y"))
    val api = Pipelines.kendallTauB(series, "ym", "x", "y").collect().head
    val pinned = Registry.byName("q_stat_46_kendall_tau_b").fn(spark, sf).collect().head
    assert(api.toSeq == pinned.toSeq)
  }

  test("brierDecomposition == q_ml_15_brier") {
    val f = orders.select(
      (floor(col("o_totalprice") * 100 + 0.5).cast("long") % 1000).as("pm"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val api = Pipelines.brierDecomposition(f, "pm", "y").collect().head
    val pinned = Registry.byName("q_ml_15_brier").fn(spark, sf).collect().head
    assert(api.toSeq == pinned.toSeq)
  }

  test("sqrtQuota == q_pipe_12_sqrt_quota") {
    val api = Pipelines.sqrtQuota(documents, "lang", 100L)
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_pipe_12_sqrt_quota").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("pseudonymize matches q_priv_10's token construction") {
    val tok = graft.sources.Tables(spark, sf, "customer")
      .select(Pipelines.pseudonymize(col("c_custkey"), "graft2026").as("t"))
    val direct = graft.sources.Tables(spark, sf, "customer")
      .select(sha2(concat(lit("graft2026|"), col("c_custkey").cast("string")), 256).as("t"))
    assert(tok.collect().map(_.getString(0)).sorted.toSeq ==
      direct.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("canonicalizeUrl collapses the q_dedup_28 variants") {
    val pid = (col("doc_id") % 50).cast("long")
    val base = concat(lit("https://www.example.com/p/"), pid.cast("string"))
    val url = when(col("doc_id") % 4 === 0, base)
      .when(col("doc_id") % 4 === 1,
        concat(lit("https://WWW.EXAMPLE.COM/p/"), pid.cast("string")))
      .when(col("doc_id") % 4 === 2, concat(base, lit("?utm_source=feed")))
      .otherwise(concat(base, lit("/")))
    val got = documents.select(pid.as("pid"),
        Pipelines.canonicalizeUrl(url).as("canon"))
      .groupBy("pid").agg(countDistinct(col("canon")).as("n"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == 1L, s"pid ${r.getLong(0)} did not collapse"))
  }
}
