package graft

/** Round-7q ETL-surface wave: brute-force replications on sf0.001. */
class Round7qOpsSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")
    .select("doc_id", "text").collect()
    .map(r => (r.getLong(0), r.getString(1)))

  test("q_proj_11_url_parse: parse_url inverts construction") {
    val cust = graft.sources.Tables(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val exp = cust.filter(_._1 < 100).sortBy(_._1).map { case (ck, seg, nk) =>
      (ck, seg.toLowerCase + ".example.com", s"/u/$ck", nk.toString, "2")
    }
    val got = Registry.byName("q_proj_11_url_parse").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(got.toSeq == exp.toSeq)
  }

  test("q_time_25_unix_roundtrip: epochs equal java.time under UTC") {
    import org.apache.spark.sql.functions.{col, date_format}
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("od"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val exp = ord.filter(_._1 < 100).sortBy(_._1).map { case (ok, od) =>
      val ldt = java.time.LocalDateTime.parse(od, fmt)
      val es = ldt.toEpochSecond(java.time.ZoneOffset.UTC)
      (ok, es, es * 1000 + ldt.getNano / 1000000, od)
    }
    val got = Registry.byName("q_time_25_unix_roundtrip").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq == exp.toSeq)
    // the formatted string drops sub-second precision; whole_seconds
    // certifies where ems == es*1000 exactly
    got.foreach(g => assert((g._3 == g._2 * 1000) == (g._5 == 1L)))
  }

  test("q_dq_36_schema_contract: every orders column matches the declared contract") {
    val got = Registry.byName("q_dq_36_schema_contract").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.length == 6)
    assert(got.forall(_._4 == 1L), s"schema drift: ${got.filter(_._4 != 1L).mkString(",")}")
    assert(got.map(_._2).toSeq == Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
  }

  test("q_win_32_frame_pitfall: default frame is current row, full frame is constant") {
    val got = Registry.byName("q_win_32_frame_pitfall").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (_, n, nDef, _, const) =>
      assert(nDef == n, "default-frame last_value must equal the current row everywhere")
      assert(const == 1L, "full-frame last_value must be one constant per partition")
    }
    // cross-check last_by_key against a brute-force max-key pick
    import org.apache.spark.sql.functions.col
    val ord = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val exp = ord.groupBy(_._1).view.mapValues { rs =>
      val last = rs.maxBy(_._3)
      math.floor(last._2 * 100 + 0.5) / 100
    }.toMap
    got.foreach { case (pr, _, _, lastVal, _) => assert(lastVal == exp(pr)) }
  }

  test("q_mm_12_base64_transport: lengths follow 4*ceil(n/3), round trip exact") {
    val exp = docs.filter(_._1 < 100).sortBy(_._1).map { case (id, text) =>
      val n = math.min(40, text.getBytes("UTF-8").length).toLong
      (id, 4 * ((n + 2) / 3), n, 1L)
    }
    val got = Registry.byName("q_mm_12_base64_transport").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
  }
}
