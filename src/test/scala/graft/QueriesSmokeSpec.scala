package graft

/** Registry/contract structural guards. Per-query execution checks live in
  * GoldenSpec (which replays every declared query against committed
  * digests — re-running them here would double the suite's runtime).
  */
class QueriesSmokeSpec extends SparkSpec {

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
}
