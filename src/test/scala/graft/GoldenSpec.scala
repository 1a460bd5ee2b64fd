package graft

import graft.tools.GoldenGen

/** Golden-snapshot regression (SURVEY §5.4): every declared query's
  * sf0.001 result must match the committed (rowcount, digest). Catches
  * semantic drift without DuckDB; regenerate intentionally with
  * `graft.tools.GoldenGen` after deliberate changes.
  */
class GoldenSpec extends SparkSpec {

  // Legitimately possibly-empty at sf0.001: near-dup family (all 500
  // texts distinct), anti join (every customer may have orders), rich-
  // account full outer (acctbal thresholds may exclude everyone),
  // cross-source verbatim overlap (same all-distinct reason; its
  // non-vacuous path is pinned by Round6fOpsSpec's synthetic corpus).
  private val mayBeEmpty = Set(
    "q_dedup_2_near", "q_dedup_3_minhash_lsh",
    "q_join_5_full_outer", "q_join_7_anti", "q_text_51_source_overlap")

  private lazy val golden: Map[String, (Long, String)] =
    scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_sf0001.txt"), "UTF-8")
      .getLines().filter(_.nonEmpty).map { line =>
        val Array(name, n, h) = line.split(",")
        name -> (n.toLong, h)
      }.toMap

  test("every declared query has a golden snapshot") {
    val missing = Registry.all.map(_.name).filterNot(golden.contains)
    assert(missing.isEmpty, s"regenerate goldens (GoldenGen); missing: $missing")
  }

  for (q <- Registry.all) {
    test(s"golden: ${q.name}") {
      golden.get(q.name).foreach { case (n, h) =>
        val (gotN, gotH) = GoldenGen.digestOf(q.fn(spark, sf))
        assert(gotN == n, s"row count drift: $gotN != $n")
        if (!mayBeEmpty(q.name)) assert(gotN > 0, s"${q.name} returned no rows")
        assert(gotH == h, "content digest drift — if intentional, rerun GoldenGen")
      }
    }
  }
}
