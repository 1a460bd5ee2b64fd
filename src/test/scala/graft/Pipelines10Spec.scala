package graft

import graft.api.Pipelines
import org.apache.spark.sql.functions._

/** Round-7n/7o Pipelines wrappers pinned EXACTLY against their declared
  * oracle-checked queries on sf0.001.
  */
class Pipelines10Spec extends SparkSpec {

  private def customers = graft.sources.Tables(spark, sf, "customer")
  private def documents = graft.sources.Tables(spark, sf, "documents")

  test("tokenLedger == q_pipe_11_token_ledger") {
    val api = Pipelines.tokenLedger(documents, "doc_id", "text", "source")
      .orderBy("source").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_pipe_11_token_ledger").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("reidRisk == q_priv_8_reid_risk") {
    val api = Pipelines.reidRisk(customers,
        Seq("c_nationkey", "c_mktsegment"), "c_nationkey")
      .orderBy("c_nationkey").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_priv_8_reid_risk").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("rbp == q_ret_11_rbp") {
    val api = Pipelines.rbp(documents, "source", "n_chars", "doc_id",
        col("lang") === "en")
      .orderBy("source").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_ret_11_rbp").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("weekdaysBetween reproduces q_time_28_bizdays") {
    val fs = graft.sources.Tables(spark, sf, "lineitem")
      .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship0"))
    val api = graft.sources.Tables(spark, sf, "orders")
      .join(fs, col("o_orderkey") === col("l_orderkey"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        Pipelines.weekdaysBetween(col("o_orderdate"), col("ship0")).as("biz"))
      .groupBy("ym")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Num.round(sum(col("biz")).cast("double") / count(lit(1)), 6)
          .as("avg_biz_days"),
        max(col("biz")).cast("long").as("max_biz_days"))
      .orderBy("ym").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_time_28_bizdays").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("vocabDrift == q_map_6_vocab_drift") {
    val api = Pipelines.vocabDrift(documents, "source", "text", "src0", "src1")
      .collect().head
    val pinned = Registry.byName("q_map_6_vocab_drift").fn(spark, sf).collect().head
    assert(api.toSeq == pinned.toSeq)
  }

  test("bottomKSample(5) == q_udaf_4_bottomk") {
    val api = Pipelines.bottomKSample(customers, "c_mktsegment", "c_custkey", 5)
      .orderBy("c_mktsegment", "rn").collect().map(_.toSeq).toSeq
    val pinned = Registry.byName("q_udaf_4_bottomk").fn(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(api == pinned)
  }

  test("bottomKSample honors k") {
    val api = Pipelines.bottomKSample(customers, "c_mktsegment", "c_custkey", 3)
    val byGroup = api.groupBy("c_mktsegment").count().collect()
    assert(byGroup.forall(_.getLong(1) == 3L))
  }
}
