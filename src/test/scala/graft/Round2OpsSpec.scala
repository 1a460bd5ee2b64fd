package graft

import graft.expressions.VectorExpressions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 operators: plan-shape assertions (the scale contracts) and
  * semantic invariants beyond the DuckDB gate.
  */
class Round2OpsSpec extends SparkSpec {

  test("q_graph_1_edges: the consecutive-line self-join is an equi hash join, not a nested loop") {
    val df = Registry.byName("q_graph_1_edges").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "arithmetic equality must be extracted as a join key:\n" + plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(df.count() > 0)
  }

  test("q_text_16_bigram_lm: AQE broadcasts the un-hinted LM tables (no SMJ regression)") {
    val df = Registry.byName("q_text_16_bigram_lm").fn(spark, sf)
    df.count() // materialize so AQE's final (measured-size) plan is visible
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "LM scoring joins must stay broadcast at this scale without an explicit hint:\n" + plan)
    assert(!plan.contains("SortMergeJoin"),
      "dropping the broadcast() hint must not regress the LM joins to SMJ:\n" + plan)
  }

  test("q_stream_8_topk_window: rank filter plans as WindowGroupLimit") {
    val plan = Registry.byName("q_stream_8_topk_window").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rk<=2 must push into a group-limit, not a full window sort:\n" + plan)
  }

  test("q_sim_4/q_sim_11: cell assignment never shuffles the corpus on vec_id") {
    for (n <- Seq("q_sim_4_ann_ivf", "q_sim_11_recall")) {
      val plan = Registry.byName(n).fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning(vec_id"),
        s"$n: argmin assignment must be a projection (round-1 regression shape):\n" + plan)
      assert(plan.contains("argmin_sqdist"), s"$n must use the native expression")
    }
  }

  test("argmin_sqdist agrees with the windowed ORDER BY (d2, cid) formulation") {
    VectorExpressions.register(spark)
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // reference: the round-1 crossJoin + window argmin
    val w = Window.partitionBy("vec_id")
      .orderBy(graft.functions.VectorFunctions.sqDist(col("embedding"), col("cvec")), col("cid"))
    val ref = e.crossJoin(broadcast(cents))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid")).orderBy("vec_id").collect().toSeq
    // native: packed single-row broadcast + projection
    val packed = cents.agg(array_sort(collect_list(struct(col("cid"), col("cvec")))).as("cs"))
      .select(transform(col("cs"), _.getField("cid")).as("cids"),
        transform(col("cs"), _.getField("cvec")).as("cvecs"))
    val got = e.crossJoin(broadcast(packed))
      .select(col("vec_id"),
        element_at(col("cids"), expr("argmin_sqdist(embedding, cvecs)") + 1).as("cid"))
      .orderBy("vec_id").collect().toSeq
    assert(got == ref)
  }

  test("lsh_bucket agrees with the nested-HOF formulation it replaced") {
    VectorExpressions.register(spark)
    val e = graft.sources.Tables(spark, sf, "embeddings").filter(col("vec_id") < 100)
    def dotPlane(j: org.apache.spark.sql.Column) =
      aggregate(
        transform(col("embedding"), (x, i) => x.cast("double") * (((i * 31 + j * 17) % 7) - 3)),
        lit(0.0), (a, x) => a + x)
    val hofBucket = aggregate(sequence(lit(0L), lit(7L)), lit(0L), (acc, j) =>
      acc + when(dotPlane(j) > 0, pow(lit(2.0), j).cast("long")).otherwise(0L))
    val both = e.select(col("vec_id"), hofBucket.as("hof"),
      expr("lsh_bucket(embedding, 8)").as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
  }

  test("q_text_14_chunk: chunks tile each document (stride 24, window 32, overlap 8)") {
    val chunks = Registry.byName("q_text_14_chunk").fn(spark, sf)
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    // chunk i covers tokens [24i, min(24i+32, n)) — its length is exactly
    // least(32, n − 24i), and chunk count is floor((n−1)/24)+1
    val bad = chunks.join(docs, "doc_id")
      .filter(col("n_toks") =!= least(lit(32L), col("n_tok") - col("chunk_id") * 24))
    assert(bad.count() == 0)
    val counts = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
      .filter(col("n_chunks") =!= floor((col("n_tok") - 1) / 24) + 1)
    assert(counts.count() == 0, "chunk count must be floor((n-1)/24)+1")
  }

  test("q_text_15_pack: packs partition the corpus tokens exactly, ids contiguous from 0") {
    val packs = Registry.byName("q_text_15_pack").fn(spark, sf)
    val perLang = packs.groupBy("lang").agg(
      sum("pack_tokens").as("packed"), min("pack_id").as("mn"),
      max("pack_id").as("mx"), count(lit(1)).as("n"))
    val docs = graft.sources.Tables(spark, sf, "documents")
      .groupBy("lang").agg(sum(size(split(col("text"), " "))).cast("long").as("total"))
    val joined = perLang.join(docs, "lang")
    assert(joined.filter(col("packed") =!= col("total")).count() == 0,
      "pack token sums must partition the corpus")
    assert(joined.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0,
      "pack ids must be contiguous from 0")
  }

  test("q_time_3_ohlc: open/close are the first/last values of each bar") {
    val ohlc = Registry.byName("q_time_3_ohlc").fn(spark, sf)
    val ev = graft.sources.Tables(spark, sf, "events")
      .withColumn("bar", window(col("ts"), "6 hours").getField("start"))
    val firsts = ev.groupBy("event_type", "bar")
      .agg(graft.functions.Num.round(
        min_by(col("value"), struct(col("ts"), col("event_id"))), 2).as("open_ref"),
        graft.functions.Num.round(
          max_by(col("value"), struct(col("ts"), col("event_id"))), 2).as("close_ref"))
    val bad = ohlc.join(firsts, Seq("event_type", "bar"))
      .filter(col("open") =!= col("open_ref") || col("close") =!= col("close_ref"))
    assert(bad.count() == 0)
  }

  test("q_graph_2_pagerank: ranks positive, deterministic across runs, top node stable") {
    val a = Registry.byName("q_graph_2_pagerank").fn(spark, sf).collect().toSeq
    val b = Registry.byName("q_graph_2_pagerank").fn(spark, sf).collect().toSeq
    assert(a == b, "PageRank must be run-to-run deterministic")
    assert(a.nonEmpty && a.forall(_.getDouble(1) > 0))
  }

  test("q_join_14_salted equals the plain join (salting is invisible in results)") {
    val salted = Registry.byName("q_join_14_salted").fn(spark, sf).collect().toSeq
    val li = graft.sources.Tables(spark, sf, "lineitem")
    val sup = graft.sources.Tables(spark, sf, "supplier")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(graft.functions.Num.round(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("s_name").collect().toSeq
    assert(salted == plain)
  }
}
