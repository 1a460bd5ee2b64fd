package graft

import graft.expressions.{JaroWinkler, StringExpressions}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler: textbook pins, algebraic laws, codegen plan
  * shape, and parity with the declared query.
  */
class StringSimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match the standard (and DuckDB's builtin)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("TRATE", "TRACE") - 0.9066666666666667) < 1e-15)
    // boost threshold: below jaro 0.7 the prefix boost must NOT apply
    assert(jw("abqqqqqq", "abzzzzzz") == 0.5)
  }

  test("algebraic laws: symmetry, identity, disjoint-zero, bounds") {
    val pairs = Seq(("red plate", "hot plate"), ("small widget", "small gizmo"),
      ("a", "ab"), ("", ""), ("x", ""), ("abc", "abc"), ("abc", "xyz"))
    pairs.foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s == jw(b, a), s"symmetry $a/$b")
      assert(s >= 0.0 && s <= 1.0, s"bounds $a/$b")
    }
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("x", "") == 0.0)
  }

  test("expression runs inside whole-stage codegen") {
    StringExpressions.register(spark)
    val df = graft.sources.Tables(spark, sf, "part")
      .select(expr("jaro_winkler(p_name, p_brand)").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix is the whole-stage-codegen marker in the
    // compact plan rendering
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    assert(df.agg(min("s"), max("s")).collect().head.getDouble(1) <= 1.0)
  }

  test("q_dedup_24_jaro: every returned pair scores >= 0.8 and ordering is stable") {
    val rows = Registry.byName("q_dedup_24_jaro").fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, s) =>
      assert(s >= 0.8 && a < b)
      assert(s == math.floor(jw(a, b) * 1e6 + 0.5) / 1e6, s"$a/$b")
    }
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }
}
