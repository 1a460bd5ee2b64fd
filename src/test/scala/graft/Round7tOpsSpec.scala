package graft

/** Round-7t lakehouse-operations wave: brute-force replications on sf0.001. */
class Round7tOpsSpec extends SparkSpec {

  private def c2(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  test("q_sort_8_ci_collation: fold-then-binary ordering replicates") {
    val sup = graft.sources.Tables(spark, sf, "supplier")
      .select("s_suppkey", "s_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = sup.map { case (k, n) =>
      val n2 = (k % 3) match {
        case 0 => n.toUpperCase; case 1 => n.toLowerCase; case _ => n
      }
      (k, n2)
    }.sortBy { case (k, n2) => (n2.toLowerCase, n2, k) }
      .zipWithIndex.map { case ((k, n2), i) => (i + 1L, k, n2) }
    val got = Registry.byName("q_sort_8_ci_collation").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == exp.toSeq)
    assert(exp.map(_._3).exists(_.exists(_.isUpper)) &&
      exp.map(_._3).exists(_.exists(_.isLower)), "mixed case must actually occur")
  }

  test("q_priv_9_min_release: exactly one level chosen, k_min non-decreasing") {
    val got = Registry.byName("q_priv_9_min_release").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.count(_._4 == 1L) == 1, "exactly one chosen level")
    val chosen = got.find(_._4 == 1L).get
    assert(chosen._2 >= 5L, "chosen level must satisfy k >= 5")
    got.filter(_._1 < chosen._1).foreach(l =>
      assert(l._2 < 5L, "every earlier level must fail k >= 5"))
    // group counts strictly coarsen up the ladder
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sortBy(-_))
  }

  test("q_sink_6_dynamic_overwrite: only 1997 changed, doubled") {
    import org.apache.spark.sql.functions.{col, year}
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select(year(col("o_orderdate")).cast("long").as("yr"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exp = ord.groupBy(_._1).toSeq.sortBy(_._1).map { case (yr, rs) =>
      val mult = if (yr == 1997L) 2L else 1L
      (yr, rs.length.toLong, rs.map(r => c2(r._2) * mult).sum)
    }
    val got = Registry.byName("q_sink_6_dynamic_overwrite").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_scan_25_hidden_files: junk files invisible to the reader") {
    val got = Registry.byName("q_scan_25_hidden_files").fn(spark, sf).collect()(0)
    val n = graft.sources.Tables(spark, sf, "nation").count()
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == 0L && got.getLong(2) == n - 1)
    assert(got.getLong(3) == 2L, "both junk files must exist on disk")
  }
}
