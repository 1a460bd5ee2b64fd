package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 30-bit SimHash of a document's DISTINCT whitespace tokens —
  * the same function as `TextFunctions.simhash32`'s declarative form
  * (split → distinct → polynomial char hash (acc·31 + codepoint) mod
  * 1e9+7 → per-bit majority vote), computed in one tight per-row loop.
  *
  * Why it exists (r9 perf): the declarative form is a NESTED
  * higher-order aggregate — 30 bit-passes × per-token char folds, all
  * interpreted (Spark lambda expressions never enter whole-stage
  * codegen) — and it was the entire cost of the corpus-scan simhash
  * queries (q_dedup_15 sat at ~4.3 s, the closest query to the 5 s
  * budget). One Java loop per row replaces ~30·|tokens| interpreted
  * expression-tree evaluations. Bit-identical to the declarative form
  * on ALL of Unicode, not just the ASCII fixture (r10 pin): tokens
  * split on single spaces keeping empties, dedup by first occurrence,
  * chars walked by CODE POINT — and the declarative mirror agrees
  * because Spark's `split(c, "")` groups by code point (astral-plane
  * chars stay whole) and `ascii()` returns the full code point (so
  * does DuckDB's). OperatorUnitSpec asserts equality on
  * Latin-1/CJK/emoji/combining rows.
  *
  * CodegenFallback like [[TokensOf]]: the per-row work is a real loop,
  * so the eval-path call is noise next to it; the operator stays a
  * narrow projection — no shuffle, fully parallel at any scale.
  */
case class SimHash30(child: Expression) extends UnaryExpression with CodegenFallback {

  private val P = 1000000007L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def prettyName: String = "simhash30"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val tokens = text.split(" ", -1) // keep trailing empties: split(text, ' ') semantics
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](30)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (seen.add(tok)) {
        var acc = 0L
        var i = 0
        while (i < tok.length) {
          val cp = tok.codePointAt(i)
          acc = (acc * 31 + cp) % P
          i += Character.charCount(cp)
        }
        var j = 0
        while (j < 30) {
          votes(j) += ((((acc >> j) & 1L) << 1) - 1L).toInt
          j += 1
        }
      }
      t += 1
    }
    var res = 0L
    var j = 0
    while (j < 30) {
      if (votes(j) > 0) res |= 1L << j
      j += 1
    }
    res
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash30 =
    copy(child = newChild)
}
