package graft

/** Every declared query must run on sf0.001; queries whose semantics
  * guarantee output on any fixture must be non-empty. (Exact value checks
  * are the DuckDB oracle's job — see tools/run_verify.sh; these are the
  * fast structural guards.)
  */
class QueriesSmokeSpec extends SparkSpec {

  // Legitimately possibly-empty at sf0.001: near-dup family (all 500
  // texts distinct), anti join (every customer may have orders), rich-
  // account full outer (acctbal thresholds may exclude everyone).
  private val mayBeEmpty = Set(
    "q_dedup_2_near", "q_dedup_3_minhash_lsh",
    "q_join_5_full_outer", "q_join_7_anti")

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("declared names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.sizeIs == names.size)
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs on sf0.001") {
      val n = q.fn(spark, sf).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }
}
