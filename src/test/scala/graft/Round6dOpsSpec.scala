package graft

import org.apache.spark.sql.functions._

/** Round-6 thin-family operators: brute-force replications over the
  * collected sf0.001 fixtures.
  */
class Round6dOpsSpec extends SparkSpec {

  test("q_arr_4_vector_stats: one vector's HOF stats replicate") {
    val rows = Registry.byName("q_arr_4_vector_stats").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val first = rows.head
    val vec = graft.sources.Tables(spark, sf, "embeddings")
      .filter(col("vec_id") === first.getLong(0))
      .select("embedding").collect().head.getSeq[Float](0).toArray
    assert(first.getLong(1) == vec.length.toLong)
    assert(first.getDouble(2) ==
      math.floor(vec.min.toDouble * 1000000 + 0.5) / 1000000)
    assert(first.getDouble(3) ==
      math.floor(vec.max.toDouble * 1000000 + 0.5) / 1000000)
    assert(first.getLong(5) == vec.count(_ > 0).toLong)
    // mean: same left-fold order as aggregate()
    val mean = vec.foldLeft(0.0)((a, x) => a + x.toDouble) / vec.length
    assert(first.getDouble(4) == math.floor(mean * 1000000 + 0.5) / 1000000)
  }

  test("q_map_3_lang_map: map lifecycle reproduces the relational GROUP BY + HAVING") {
    val got = Registry.byName("q_map_3_lang_map").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val exp = graft.sources.Tables(spark, sf, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).orderBy("source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == exp)
  }

  test("q_json_6_nested_roundtrip: JSON pack/unpack equals the direct window aggregate") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val exp = graft.sources.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), floor(col("value") * 100 + 0.5).cast("long").as("cents"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Registry.byName("q_json_6_nested_roundtrip").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp)
  }

  test("q_filter_4_selectivity: ladder is monotone and the deepest predicate replicates") {
    val r = Registry.byName("q_filter_4_selectivity").fn(spark, sf).collect().head
    val counts = (0 to 4).map(i => r.getLong(i))
    counts.sliding(2).foreach(w => assert(w(0) >= w(1)))
    val expP4 = graft.sources.Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date")
        && col("l_discount") > 0.05 && col("l_quantity") >= 25
        && col("l_returnflag") === "R")
      .count()
    assert(counts(4) == expP4)
  }

  test("q_dq_34_pk_audit: per-table key counts replicate; lineitem composite key genuinely fails") {
    val rows = Registry.byName("q_dq_34_pk_audit").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toMap2
    val o = graft.sources.Tables(spark, sf, "orders")
    assert(rows("orders") == (o.count(), o.select("o_orderkey").distinct().count()))
    val li = graft.sources.Tables(spark, sf, "lineitem")
    val (n, k) = rows("lineitem")
    assert(n == li.count())
    assert(k == li.select(col("l_orderkey") * 100 + col("l_linenumber")).distinct().count())
    assert(k < n, "fixture lineitem composite key should NOT be unique")
    assert(rows("orders")._1 == rows("orders")._2, "orders PK should be unique")
  }

  private implicit class Tup3Ops(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
