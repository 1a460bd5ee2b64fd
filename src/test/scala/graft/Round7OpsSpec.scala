package graft

import org.apache.spark.sql.functions._

/** Round-7 privacy/catalog operators: brute-force replications on
  * sf0.001.
  */
class Round7OpsSpec extends SparkSpec {

  private def customers =
    graft.sources.Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_mktsegment"), col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  test("q_priv_1_kanon: k, group count and risk share replicate") {
    val groups = customers.groupBy(c => (c._2, c._3)).values.map(_.size.toLong).toSeq
    val atRisk = groups.filter(_ < 5).sum
    val r = Registry.byName("q_priv_1_kanon").fn(spark, sf).collect().head
    assert(r.getLong(0) == groups.size.toLong)
    assert(r.getLong(1) == groups.min)
    assert(r.getLong(2) == groups.max)
    assert(r.getLong(3) == groups.sum)
    assert(r.getLong(4) == atRisk)
    assert(r.getDouble(5) ==
      math.floor(atRisk.toDouble / groups.sum * 1000000 + 0.5) / 1000000)
  }

  test("q_priv_2_ldiversity: min_l and exposed counts replicate") {
    val g = customers.groupBy(c => (c._2, c._3)).values.map { cs =>
      (cs.size.toLong, cs.map(c => math.floor(c._4 / 1000).toLong).distinct.size.toLong)
    }.toSeq
    val r = Registry.byName("q_priv_2_ldiversity").fn(spark, sf).collect().head
    assert(r.getLong(0) == g.size.toLong)
    assert(r.getLong(1) == g.map(_._2).min)
    assert(r.getLong(3) == g.count(_._2 < 3).toLong)
    assert(r.getLong(4) == g.filter(_._2 < 3).map(_._1).sum)
  }

  test("q_priv_3_generalization: k non-decreasing up the ladder; level 3 replicates") {
    val rows = Registry.byName("q_priv_3_generalization").fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // coarser QI ⇒ groups merge ⇒ the min group size cannot shrink
    assert(rows(0)._3 <= rows(1)._3 && rows(1)._3 <= rows(2)._3)
    val segSizes = customers.groupBy(_._3).values.map(_.size.toLong)
    assert(rows(2)._2 == segSizes.size.toLong && rows(2)._3 == segSizes.min)
  }

  test("q_priv_4_quasi_unique: uniqueness risk replicates") {
    val combos = customers
      .groupBy(c => (c._2, c._3, math.floor(c._4 / 100).toLong)).values
      .map(_.size.toLong).toSeq
    val r = Registry.byName("q_priv_4_quasi_unique").fn(spark, sf).collect().head
    assert(r.getLong(0) == combos.sum && r.getLong(1) == combos.size.toLong)
    assert(r.getLong(2) == combos.count(_ == 1).toLong)
  }

  test("q_dq_35_fk_audit: five edges, zero orphans on the TPC-H-shaped fixture, child counts match") {
    val rows = Registry.byName("q_dq_35_fk_audit").fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 5)
    rows.foreach { case (e, _, orphans) => assert(orphans == 0L, s"$e has orphans") }
    val counts = Map(
      "customer.c_nationkey->nation" -> graft.sources.Tables(spark, sf, "customer").count(),
      "lineitem.l_orderkey->orders" -> graft.sources.Tables(spark, sf, "lineitem").count(),
      "nation.n_regionkey->region" -> graft.sources.Tables(spark, sf, "nation").count(),
      "orders.o_custkey->customer" -> graft.sources.Tables(spark, sf, "orders").count(),
      "supplier.s_nationkey->nation" -> graft.sources.Tables(spark, sf, "supplier").count())
    rows.foreach { case (e, n, _) => assert(n == counts(e), s"$e child count") }
  }

  test("q_set_9_symdiff: year flags replicate; identities hold") {
    val o = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .filter(col("y").isin(1995, 1996))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byCust = o.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val only95 = byCust.count { case (_, ys) => ys == Set(1995) }.toLong
    val only96 = byCust.count { case (_, ys) => ys == Set(1996) }.toLong
    val both = byCust.count { case (_, ys) => ys == Set(1995, 1996) }.toLong
    val r = Registry.byName("q_set_9_symdiff").fn(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((only95, only96, both, only95 + only96 + both)))
  }
}
