package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (table-valued function): one output row
  * per whitespace token of the input string, column name `token` — the
  * custom-UDTF extension path (SURVEY §2.11), sitting beside the two
  * other generator formulations the engine ships (`explode(split(...))`
  * and typed `Dataset.flatMap`); the unit test pins all three to
  * identical output.
  *
  * Generators run through `GenerateExec`'s eval path (CodegenFallback is
  * the norm — Spark's own `Stack`/`JsonTuple` do the same); the per-row
  * cost is one split over the UTF8 bytes, and the operator is a narrow
  * transformation — no shuffle, fully parallel at any scale.
  */
case class TokensOf(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("token", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def prettyName: String = "tokens_of"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    if (s == null) Nil
    else {
      // split on single spaces, preserving empty tokens — IDENTICAL to
      // split(text, ' ') semantics so the three formulations agree
      val parts = s.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
      parts.map(t => InternalRow(t))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokensOf =
    copy(child = newChild)
}
