package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity — the fuzzy-name matcher entity
  * resolution uses where edit distance over-penalizes transpositions
  * (MARTHA/MARHTA is 0.961 here but 2 edits away).
  *
  * Textbook definition (matching DuckDB's `jaro_winkler_similarity`
  * bit-for-bit on the standard examples, which is what lets the
  * declared query hash-match): match window = max(|a|,|b|)/2 − 1,
  * transpositions = half the out-of-order matches,
  * jaro = (m/|a| + m/|b| + (m−t)/m) / 3,
  * winkler = jaro + min(prefix,4)·0.1·(1−jaro).
  *
  * Codegen emits one static call (the Spark-internal pattern for
  * string algorithms, e.g. Levenshtein) — no interpreted fallback,
  * stays inside whole-stage codegen.
  */
object JaroWinkler {
  def similarity(sa: UTF8String, sb: UTF8String): Double = {
    val a = sa.toString
    val b = sb.toString
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
    // Winkler prefix boost (cap 4, scale 0.1) — applied only above the
    // standard 0.7 threshold (DuckDB/boost semantics: probe pair
    // 'abqqqqqq'/'abzzzzzz' stays at its jaro 0.5 despite the prefix)
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) && a.charAt(prefix) == b.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}

object StringExpressions {
  /** Registers `jaro_winkler(a, b)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinklerSimilarity(exprs(0), exprs(1)), "built-in")
}
