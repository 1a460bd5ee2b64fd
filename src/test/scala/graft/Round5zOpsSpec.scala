package graft

import org.apache.spark.sql.functions._

/** Round-5z operators: brute-force Scala replications over collected
  * sf0.001 fixtures.
  */
class Round5zOpsSpec extends SparkSpec {

  test("q_scan_19_csv_options: quoting survives a payload containing the delimiter") {
    val nation = graft.sources.Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    val row = Registry.byName("q_scan_19_csv_options").fn(spark, sf).collect().head
    assert(row.getLong(0) == nation.length.toLong)
    assert(row.getLong(1) == nation.map(_._1.toLong).sum)
    assert(row.getLong(2) == nation.map(n => (n._2 + "|" + n._3).length.toLong).sum)
    // every payload kept its embedded delimiter through the roundtrip
    assert(row.getLong(3) == nation.length.toLong)
  }

  test("q_agg_39_group_topk: packed string lists the exact top-3 keys in order") {
    val orders = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val expected = orders.groupBy(_._1).view.mapValues { os =>
      val top = os.sortBy(o => (-o._3, o._2)).take(3)
      (top.map(_._2).mkString(","),
        math.floor(top.map(_._3).sum.toDouble / 100 * 100 + 0.5) / 100)
    }.toMap
    val got = Registry.byName("q_agg_39_group_topk").fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == expected)
  }

  test("q_dq_31_dup_rows: summary conserves row count; fixtures may legitimately hold dups") {
    val row = Registry.byName("q_dq_31_dup_rows").fn(spark, sf).collect().head
    val total = graft.sources.Tables(spark, sf, "lineitem").count()
    val (nd, ndg, nrd, worst) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // distinct rows + extra copies = total
    assert(nd + (nrd - ndg) == total)
    assert(worst >= 1)
    if (ndg == 0) assert(nrd == 0 && worst == 1)
  }

  test("q_win_24_tie_ranks: max_rank = n and dense_rank counts buckets") {
    val rows = Registry.byName("q_win_24_tie_ranks").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val orders = graft.sources.Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1)).toLong / 1000))
    rows.foreach { case (p, n, maxRank, nBuckets, nGapped) =>
      val mine = orders.filter(_._1 == p)
      assert(n == mine.length.toLong, p)
      // rank reaches the partition size iff the LAST bucket is a singleton;
      // in general max(rank) = n - (size of the largest-value tie group) + 1
      val topBucketSize = mine.groupBy(_._2).maxBy(_._1)._2.length.toLong
      assert(maxRank == n - topBucketSize + 1, p)
      assert(nBuckets == mine.map(_._2).distinct.length.toLong, p)
      // rows before the first tie have rank == dense_rank; gaps appear after
      assert(nGapped <= n, p)
    }
    assert(rows.nonEmpty)
  }
}
